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
