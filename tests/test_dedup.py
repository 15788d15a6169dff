"""Deduplicate stage tests (behavior pinned by reference test.py:162-333
and example/datasets/README.txt)."""

import gzip

from conftest import run_vclust, DATASET_FILES

REF_IDS = ['NC_002486.1', 'NC_005091.2', 'NC_010807.1', 'NC_025457.1',
           'MN428048.1', 'MK937595.1', 'Mushuvirus']
REF_DUPLICATES = {
    'Mushuvirus -Mushuvirus_copy',
    'NC_025457.1 -KJ473423.1',
    'NC_010807.1 -EU547803.1 -NC_010807.1_duplicate',
    'NC_005091.2 -AY357582.2 -AY357582.2_duplicate',
    'MN428048.1 +MN428048.1_revcomp',
    'NC_002486.1 -AB044554.1',
}


def _fasta_ids(path):
    opener = gzip.open if str(path).endswith('.gz') else open
    ids = []
    with opener(path, 'rt') as fh:
        for line in fh:
            if line.startswith('>'):
                ids.append(line.split()[0].lstrip('>'))
    return ids


def test_deduplicate_default(test_dir):
    out_file = test_dir / 'nr.fna'
    dups_file = test_dir / 'nr.fna.duplicates.txt'
    p = run_vclust(['deduplicate', '-i', *DATASET_FILES, '-o', out_file,
                    '-v', '0'])
    assert p.returncode == 0
    assert not p.stderr
    assert out_file.exists() and out_file.stat().st_size
    assert dups_file.exists() and dups_file.stat().st_size
    assert _fasta_ids(out_file) == REF_IDS
    lines = {line.strip() for line in open(dups_file) if line.strip()}
    assert lines == REF_DUPLICATES


def test_deduplicate_auto_prefixes(test_dir):
    out_file = test_dir / 'nr.fna'
    p = run_vclust(['deduplicate', '-i', *DATASET_FILES, '-o', out_file,
                    '-v', '0', '--add-prefixes'])
    assert p.returncode == 0, p.stderr
    prefixes = [i.split('|')[0] for i in _fasta_ids(out_file)]
    assert len(prefixes) == 7
    assert set(prefixes) == {'refseq', 'genbank', 'other'}


def test_deduplicate_explicit_prefixes(test_dir):
    out_file = test_dir / 'nr.fna'
    p = run_vclust(['deduplicate', '-i', *DATASET_FILES, '-o', out_file,
                    '-v', '0', '--add-prefixes', 'refseq|', 'genbank|',
                    'other|'])
    assert p.returncode == 0, p.stderr
    prefixes = [i.split('|')[0] for i in _fasta_ids(out_file)]
    assert set(prefixes) == {'refseq', 'genbank', 'other'}


def test_deduplicate_gzip_appends_suffix(test_dir):
    out_file = test_dir / 'nr.fna'       # no .gz: suffix is auto-appended
    p = run_vclust(['deduplicate', '-i', *DATASET_FILES, '-o', out_file,
                    '-v', '0', '--gzip-output'])
    assert p.returncode == 0
    gz = test_dir / 'nr.fna.gz'
    assert gz.exists() and gz.stat().st_size
    assert (test_dir / 'nr.fna.gz.duplicates.txt').exists()
    assert _fasta_ids(gz) == REF_IDS


def test_deduplicate_verbose_logging(test_dir):
    out_file = test_dir / 'nr.fna'
    p = run_vclust(['deduplicate', '-i', *DATASET_FILES, '-o', out_file])
    assert p.returncode == 0
    assert all(w in p.stderr for w in ['Running', 'Completed', 'INFO'])
