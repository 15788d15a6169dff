"""Prefilter stage tests. Golden values from example/output/fltr.txt are the
oracle (reference test.py:336-413 checks 6 pairs to 1e-6; we check the whole
file byte-for-byte)."""

import pytest

from conftest import run_vclust, FASTA_DIR, FASTA_FILE, FASTAGZ_FILE, \
    FLTR_FILE


def test_prefilter_multifasta_golden_parity(test_dir):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out, '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert out.read_text() == FLTR_FILE.read_text()


def test_prefilter_gzip_input_golden_parity(test_dir):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTAGZ_FILE, '-o', out, '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert out.read_text() == FLTR_FILE.read_text()


def test_prefilter_batched_golden_parity(test_dir):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out, '-v', '0',
                    '--batch-size', '4'])
    assert p.returncode == 0, p.stderr
    assert out.read_text() == FLTR_FILE.read_text()


def test_prefilter_directory_input(test_dir):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTA_DIR, '-o', out, '-v', '0'])
    assert p.returncode == 0, p.stderr
    golden = FLTR_FILE.read_text()
    mine = out.read_text()
    # Same pair values; name order differs (directory listing is sorted,
    # multifasta order is file order), so compare the parsed matrices.
    import sys
    sys.path.insert(0, '.')
    from vclust_tpu.io.formats import read_fltr
    g = read_fltr(FLTR_FILE)
    m = read_fltr(out)
    assert sorted(g.names) == sorted(m.names)
    gmap = {frozenset((g.names[i], g.names[j])): v
            for (i, j), v in g.entries.items()}
    mmap = {frozenset((m.names[i], m.names[j])): v
            for (i, j), v in m.entries.items()}
    assert gmap == mmap


@pytest.mark.parametrize('params', [
    ['--min-kmers', '10'],
    ['--min-ident', '0.8'],
    ['--kmers-fraction', '0.5'],
    ['--max-seqs', '2'],
    ['-k', '21'],
])
def test_prefilter_param_smoke(test_dir, params):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out, '-v', '0',
                    *params])
    assert p.returncode == 0, p.stderr
    assert out.exists() and out.stat().st_size


def test_prefilter_min_ident_drops_pairs(test_dir):
    out = test_dir / 'fltr.txt'
    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out, '-v', '0',
                    '--min-ident', '0.95'])
    assert p.returncode == 0
    from vclust_tpu.io.formats import read_fltr
    m = read_fltr(out)
    assert all(v >= 0.95 for v in m.entries.values())
    assert len(m.entries) < 13
