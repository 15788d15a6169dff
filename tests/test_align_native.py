"""Native C++ engine vs Python oracle: bit-identical alignments."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '.')

from vclust_tpu.ops import lz_native
from vclust_tpu.ops.lz_parse_py import AlignParams, ReferenceIndex, \
    parse_pair
from vclust_tpu.core.seq import encode

pytestmark = pytest.mark.skipif(not lz_native.available(),
                                reason='native engine unavailable')


def _key(alns):
    return [(a.qstart, a.qend, a.rstart, a.rend, a.nt_match,
             a.nt_mismatch, a.strand) for a in alns]


def _mutate(rng, seq, sub=0.02, indel=0.002):
    bases = 'ACGT'
    out = []
    for ch in seq:
        r = rng.random()
        if r < sub:
            out.append(bases[rng.integers(0, 4)])
        elif r < sub + indel:
            if rng.random() < 0.5:
                continue                       # deletion
            out.append(ch + bases[rng.integers(0, 4)])  # insertion
        else:
            out.append(ch)
    return ''.join(out)


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_native_matches_python_random(seed):
    rng = np.random.default_rng(seed)
    ref = ''.join(rng.choice(list('ACGT'), 6000))
    q = _mutate(rng, ref)
    # Splice in a reverse-complement segment and a translocation.
    comp = str.maketrans('ACGT', 'TGCA')
    q = q[:2000] + ref[3000:3600].translate(comp)[::-1] + q[2600:]
    params = AlignParams()
    r_codes, q_codes = encode(ref), encode(q)
    py = parse_pair(q_codes, ReferenceIndex(r_codes, params), params)
    nat = lz_native.parse_pair_native(
        q_codes, lz_native.NativeReferenceIndex(r_codes, params), params)
    assert _key(py) == _key(nat)


def test_native_matches_python_example_pair():
    from conftest import FASTA_FILE
    from vclust_tpu.io.fasta import read_fasta
    recs = {r.id: r for r in read_fasta(FASTA_FILE)}
    params = AlignParams()
    q = encode(recs['NC_025457.alt2'].seq)
    r = encode(recs['NC_025457'].seq)
    py = parse_pair(q, ReferenceIndex(r, params), params)
    nat = lz_native.parse_pair_native(
        q, lz_native.NativeReferenceIndex(r, params), params)
    assert _key(py) == _key(nat)


def test_native_handles_n_bases():
    params = AlignParams()
    rng = np.random.default_rng(7)
    ref = ''.join(rng.choice(list('ACGT'), 2000))
    q = ref[:900] + 'N' * 37 + ref[900:]
    py = parse_pair(encode(q), ReferenceIndex(encode(ref), params), params)
    nat = lz_native.parse_pair_native(
        encode(q), lz_native.NativeReferenceIndex(encode(ref), params),
        params)
    assert _key(py) == _key(nat)


def test_native_empty_query():
    params = AlignParams()
    ref = 'ACGT' * 100
    nat = lz_native.parse_pair_native(
        encode(''), lz_native.NativeReferenceIndex(encode(ref), params),
        params)
    assert nat == []

def test_batch_all2all_matches_engines():
    """The multithreaded batch API == per-pair loop == Python oracle,
    including the kept alignment rows, at several thread counts."""
    from conftest import FASTA_FILE
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.align import run_align

    genomes, _ = load_genomes(FASTA_FILE)
    genomes = genomes[:6]
    params = AlignParams()
    base = run_align(genomes, params=params, keep_alignments=True,
                     engine='py')

    def row_key(res):
        return [(r.qidx, r.ridx, r.tani, r.gani, r.ani, r.qcov, r.rcov,
                 r.num_alns, r.nt_match, r.nt_mismatch) for r in res.rows]

    def aln_key(res):
        return [(a.query, a.reference, a.alnlen, a.qstart, a.qend,
                 a.rstart, a.rend, a.nt_match) for a in res.alignments]

    for n_threads in (1, 4):
        batch = run_align(genomes, params=params, keep_alignments=True,
                          engine='native', num_threads=n_threads)
        assert row_key(batch) == row_key(base)
        assert aln_key(batch) == aln_key(base)
