"""Align stage tests: accuracy against simulated ground truth (reference
test.py:441-477, tolerance ±0.007; truth table example/README.txt) plus
golden-tolerance and format checks."""

import pytest

from conftest import ANI_FILE, IDS_FILE, run_vclust, FASTA_FILE

# (reference genome, mutated genome) -> true tANI (example/README.txt).
TRUE_TANI = {
    ('NC_010807', 'NC_010807.alt1'): 0.99753,
    ('NC_010807', 'NC_010807.alt2'): 0.98985,
    ('NC_010807', 'NC_010807.alt3'): 0.98414,
    ('NC_005091', 'NC_005091.alt1'): 0.97161,
    ('NC_005091', 'NC_005091.alt2'): 0.96707,
    ('NC_025457', 'NC_025457.alt1'): 0.80607,
    ('NC_025457', 'NC_025457.alt2'): 0.75921,
    ('NC_002486', 'NC_002486.alt'): 1.00000,
}


def _load_rows(path):
    rows = {}
    with open(path) as fh:
        header = fh.readline().rstrip('\n').split('\t')
        for line in fh:
            t = line.rstrip('\n').split('\t')
            d = dict(zip(header, t))
            rows[(d['query'], d['reference'])] = d
    return header, rows


def test_align_accuracy_vs_truth(align_result):
    _, rows = _load_rows(align_result / 'ani.tsv')
    for (ref, alt), truth in TRUE_TANI.items():
        key = (ref, alt) if (ref, alt) in rows else (alt, ref)
        assert key in rows, f'missing pair {ref} vs {alt}'
        tani = float(rows[key]['tani'])
        assert tani == pytest.approx(truth, abs=0.007), f'{ref} vs {alt}'


def test_align_golden_tolerance(align_result):
    """All 132 directed rows within tight tolerance of the golden ani.tsv."""
    _, mine = _load_rows(align_result / 'ani.tsv')
    _, golden = _load_rows(ANI_FILE)
    assert set(mine) == set(golden)
    for key, g in golden.items():
        m = mine[key]
        assert float(m['tani']) == pytest.approx(float(g['tani']), abs=3e-3)
        assert float(m['gani']) == pytest.approx(float(g['gani']), abs=4e-3)
        assert float(m['qcov']) == pytest.approx(float(g['qcov']), abs=5e-3)


def test_align_ids_golden_parity(align_result):
    assert (align_result / 'ani.ids.tsv').read_text() == \
        IDS_FILE.read_text()


def test_align_row_ordering(align_result):
    """Pairs emitted as (q=longer-index j, r=i) then (q=i, r=j), i < j."""
    _, rows = _load_rows(align_result / 'ani.tsv')
    keys = list(rows.values())
    seen = [(int(d['qidx']), int(d['ridx'])) for d in keys]
    for k in range(0, len(seen) - 1, 2):
        q1, r1 = seen[k]
        q2, r2 = seen[k + 1]
        assert (q1, r1) == (r2, q2)
        assert r1 < q1, 'first row of a pair must have the shorter as query'


def test_align_tani_symmetric(align_result):
    _, rows = _load_rows(align_result / 'ani.tsv')
    for (q, r), d in rows.items():
        assert rows[(r, q)]['tani'] == d['tani']


@pytest.mark.parametrize('outfmt,ncols', [
    ('lite', 9), ('standard', 11), ('complete', 15),
])
def test_align_outfmt(test_dir, outfmt, ncols):
    # Subset input (4 genomes) keeps this fast.
    import vclust_tpu  # noqa: F401  (repo on sys.path via conftest)
    from vclust_tpu import ALIGN_OUTFMT
    sub = test_dir / 'sub.fna'
    _write_subset(sub, ['NC_010807', 'NC_010807.alt1'])
    out = test_dir / 'ani.tsv'
    p = run_vclust(['align', '-i', sub, '-o', out, '--outfmt', outfmt,
                    '-v', '0'])
    assert p.returncode == 0, p.stderr
    header = open(out).readline().rstrip('\n').split('\t')
    assert header == ALIGN_OUTFMT[outfmt]
    assert len(header) == ncols


def test_align_aln_output(align_result):
    path = align_result / 'ani.aln.tsv'
    with open(path) as fh:
        header = fh.readline().rstrip('\n').split('\t')
        assert header == ['query', 'reference', 'pident', 'alnlen', 'qstart',
                          'qend', 'rstart', 'rend', 'nt_match', 'nt_mismatch']
        n_rev = 0
        for line in fh:
            t = line.rstrip('\n').split('\t')
            alnlen = int(t[3])
            qs, qe, rs, re = int(t[4]), int(t[5]), int(t[6]), int(t[7])
            assert qe - qs + 1 == alnlen
            assert int(t[8]) + int(t[9]) == alnlen
            if rs > re:
                n_rev += 1
        assert n_rev > 0, 'reverse-strand alignments must be encoded as ' \
            'rstart > rend'


def test_align_out_filter(test_dir):
    sub = test_dir / 'sub.fna'
    _write_subset(sub, ['NC_010807', 'NC_010807.alt1', 'NC_005091'])
    out = test_dir / 'ani.tsv'
    p = run_vclust(['align', '-i', sub, '-o', out, '--out-tani', '0.9',
                    '-v', '0'])
    assert p.returncode == 0, p.stderr
    _, rows = _load_rows(out)
    assert rows, 'related pair must survive the tANI filter'
    for d in rows.values():
        assert float(d['tani']) >= 0.9


def _write_subset(path, names):
    from vclust_tpu.io.fasta import read_fasta, write_fasta
    records = [r for r in read_fasta(FASTA_FILE) if r.id in names]
    assert len(records) == len(names)
    write_fasta(path, records)
