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


def test_kmers_fraction_semantics(test_dir):
    """--kmers-fraction (the MinHash-style sketch subsample, reference
    vclust.py:240-248; hash is [EXTERNAL], so only behavior is pinned):
    deterministic across runs, samples ~fraction of each genome's k-mers,
    and still surfaces every golden candidate pair on the example corpus.
    """
    import numpy as np
    from vclust_tpu.core.kmers import canonical_kmer_set
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.prefilter import run_prefilter

    genomes, _ = load_genomes(FASTA_FILE)
    rng_seq = genomes[0].seqs[0]
    full = canonical_kmer_set(rng_seq, 25, 1.0)
    for fraction in (0.5, 0.2):
        a = canonical_kmer_set(rng_seq, 25, fraction)
        b = canonical_kmer_set(rng_seq, 25, fraction)
        assert np.array_equal(a, b)                 # deterministic
        assert set(a) <= set(full)                  # a true subsample
        ratio = len(a) / len(full)
        assert abs(ratio - fraction) < 0.02         # ~fraction of k-mers

    golden = run_prefilter(genomes, k=25, min_kmers=10, min_ident=0.7)
    sampled = run_prefilter(genomes, k=25, min_kmers=10, min_ident=0.7,
                            kmers_fraction=0.5)
    # Every golden candidate pair survives a 0.5 sketch on this corpus,
    # and sampling cannot invent strong new pairs.
    assert set(golden.entries) <= set(sampled.entries) | set()
    for key, v in sampled.entries.items():
        if key not in golden.entries:
            assert v < 0.95


def test_fraction_batched_matches_unbatched(test_dir):
    """Cross-batch determinism at --kmers-fraction < 1 (reference
    large.yml:62-66 runs IMGVR at fraction 0.2 WITH --batch-size, so the
    subsample must be a pure per-k-mer-value rule — identical whether a
    genome is indexed in one batch or across many): the batched CLI run
    must produce byte-identical fltr.txt to the unbatched one."""
    out_a = test_dir / 'a.txt'
    out_b = test_dir / 'b.txt'
    pa = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out_a,
                     '--min-kmers', '4', '--kmers-fraction', '0.3'])
    pb = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', out_b,
                     '--min-kmers', '4', '--kmers-fraction', '0.3',
                     '--batch-size', '4'])
    assert pa.returncode == 0 and pb.returncode == 0
    assert out_a.read_bytes() == out_b.read_bytes()
