"""Unit tests for sequence encoding and canonical k-mer extraction."""

import sys

import numpy as np

sys.path.insert(0, '.')

from vclust_tpu.core.seq import (encode, decode, revcomp_codes, revcomp_str,
                                 canonical_bytes, pack2bit)
from vclust_tpu.core.kmers import canonical_kmer_set, canonical_kmers


def test_encode_decode():
    codes = encode('ACGTN')
    assert codes.tolist() == [0, 1, 2, 3, 4]
    assert decode(codes) == 'ACGTN'
    assert encode('acgt').tolist() == [0, 1, 2, 3]


def test_revcomp():
    assert revcomp_str(b'ACGT') == b'ACGT'
    assert revcomp_str(b'AACG') == b'CGTT'
    assert decode(revcomp_codes(encode('AACG'))) == 'CGTT'


def test_canonical_bytes():
    assert canonical_bytes(b'AACG') == b'AACG'      # < CGTT
    assert canonical_bytes(b'TTTT') == b'AAAA'
    assert canonical_bytes(b'acgt') == b'ACGT'


def test_canonical_kmers_revcomp_invariant():
    seq = 'ACGTACGGGTACGTTAGCATCGATCAGCTACGATCAGCATCAGT' * 3
    k = 11
    fwd = canonical_kmer_set(seq, k)
    rc = canonical_kmer_set(revcomp_str(seq).decode(), k)
    assert np.array_equal(fwd, rc)


def test_canonical_kmers_skip_invalid():
    vals = canonical_kmers(encode('ACGTNACGT'), 4)
    # Windows overlapping the N are dropped: positions 0 and 5 only... each
    # side contributes len-3 windows minus those touching N.
    assert len(vals) == 2


def test_kmer_count_matches_bruteforce():
    rng = np.random.default_rng(0)
    seq = ''.join(rng.choice(list('ACGT'), 500))
    k = 15
    mine = canonical_kmer_set(seq, k)
    # brute force
    def canon(s):
        comp = str.maketrans('ACGT', 'TGCA')
        rc = s.translate(comp)[::-1]
        return min(s, rc)
    brute = sorted({canon(seq[i:i + k]) for i in range(len(seq) - k + 1)})
    enc = []
    for s in brute:
        v = 0
        for ch in s:
            v = (v << 2) | 'ACGT'.index(ch)
        enc.append(v)
    assert mine.tolist() == sorted(enc)


def test_pack2bit():
    codes = encode('ACGT' * 8)          # 32 bases = 2 words of 16
    packed = pack2bit(codes)
    assert packed.shape == (2,)
    word = packed.view(np.uint32)[0]
    # base i at bits 2i: A=0,C=1,G=2,T=3 -> pattern 0b11100100 repeated
    assert word == 0xE4E4E4E4


class TestFractionMode:
    """Statistical contract of --kmers-fraction (reference vclust.py:240-248,
    kmer-db `-f`): the subsample must behave like a uniform random fraction
    of the k-mer universe, and prefiltering at fraction 0.2 (the IMGVR
    config, reference .github/workflows/large.yml:62-66) must keep its
    recall on a mutated corpus. The exact hash differs from kmer-db's
    (parity only required at fraction 1.0) — these tests pin the
    *statistical* properties any correct sampler must have."""

    def _genome(self, rng, n=20000):
        return ''.join(rng.choice(list('ACGT'), n))

    def test_fraction_keeps_binomial_share(self):
        rng = np.random.default_rng(11)
        seq = self._genome(rng)
        full = canonical_kmer_set(seq, 21, 1.0)
        n = len(full)
        for f in (0.5, 0.2, 0.05):
            sub = canonical_kmer_set(seq, 21, f)
            # 5-sigma binomial bounds on the kept count.
            sd = (n * f * (1 - f)) ** 0.5
            assert abs(len(sub) - f * n) < 5 * sd, (f, len(sub), n)
            # Subset of the full set (threshold sampling is consistent).
            assert np.isin(sub, full).all()

    def test_fraction_sample_is_unbiased_across_value_range(self):
        """The kept fraction must be flat across the k-mer value range
        (a sampler keying on raw value rather than a mixed hash would
        fail): chi-square over 16 value-quantile buckets."""
        rng = np.random.default_rng(12)
        seq = self._genome(rng, 60000)
        full = canonical_kmer_set(seq, 21, 1.0)
        sub = canonical_kmer_set(seq, 21, 0.25)
        edges = np.quantile(full.astype(np.float64), np.linspace(0, 1, 17))
        kept = np.isin(full, sub)
        chi2 = 0.0
        for b in range(16):
            lo, hi = edges[b], edges[b + 1]
            inb = (full.astype(np.float64) >= lo) & (
                full.astype(np.float64) < hi)
            nb = int(inb.sum())
            if nb == 0:
                continue
            kb = int(kept[inb].sum())
            exp = nb * 0.25
            chi2 += (kb - exp) ** 2 / (exp * 0.75)
        # 15 dof; P(chi2 > 37.7) ~ 0.001
        assert chi2 < 37.7, chi2

    def test_fraction_containment_estimate_tracks_full(self):
        """Containment measured on the sampled sets approximates the full
        containment — the property the ani-shorter estimate rests on."""
        rng = np.random.default_rng(13)
        seq = self._genome(rng, 40000)
        s = np.frombuffer(seq.encode(), dtype='S1').copy()
        acgt = np.frombuffer(b'ACGT', dtype='S1')
        mask = rng.random(len(s)) < 0.01          # ~1% mutated
        s[mask] = acgt[rng.integers(0, 4, mask.sum())]
        mut = s.tobytes().decode()
        for f in (1.0, 0.2):
            a = canonical_kmer_set(seq, 21, f)
            b = canonical_kmer_set(mut, 21, f)
            shared = len(np.intersect1d(a, b, assume_unique=True))
            c = shared / min(len(a), len(b))
            if f == 1.0:
                c_full = c
        assert abs(c - c_full) < 0.03, (c, c_full)

    def test_prefilter_recall_at_fraction_02(self):
        """IMGVR envelope: fraction 0.2 with min_kmers 4 must keep every
        true mutant pair (<= 10% divergence) found at fraction 1.0."""
        from vclust_tpu.models.input import Genome
        from vclust_tpu.models.prefilter import run_prefilter
        rng = np.random.default_rng(14)
        acgt = np.frombuffer(b'ACGT', dtype='S1')
        genomes = []
        for i in range(12):
            base = acgt[rng.integers(0, 4, 8000)]
            genomes.append(Genome(name=f'g{i}', seqs=[base.tobytes()]))
            mut = base.copy()
            mask = rng.random(len(mut)) < rng.uniform(0.01, 0.08)
            mut[mask] = acgt[rng.integers(0, 4, mask.sum())]
            genomes.append(Genome(name=f'g{i}m', seqs=[mut.tobytes()]))
        full = run_prefilter(genomes, k=21, min_kmers=20, min_ident=0.7,
                             backend='host')
        sub = run_prefilter(genomes, k=21, min_kmers=4, min_ident=0.7,
                            kmers_fraction=0.2, backend='host')
        true_pairs = {(2 * i, 2 * i + 1) for i in range(12)}
        full_found = {tuple(sorted(p)) for p in full.entries} & {
            tuple(sorted(p)) for p in true_pairs}
        sub_found = {tuple(sorted(p)) for p in sub.entries} & {
            tuple(sorted(p)) for p in true_pairs}
        assert len(full_found) == 12
        assert len(sub_found) == 12, (
            f'fraction 0.2 lost {12 - len(sub_found)} true pairs')
