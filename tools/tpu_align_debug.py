#!/usr/bin/env python
"""Per-position diagnostic for the TPU aligner on one directed pair.

Runs the TPU engine's row core in debug mode and the exact Python parse,
then reports per-block disagreements: where the exact engine credits
matches that the TPU raster misses, and vice versa.

Usage: JAX_PLATFORMS=cpu python tools/tpu_align_debug.py QNAME RNAME
"""
import os
import sys
from functools import partial

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import _genome_codes
from vclust_tpu.ops.lz_parse_py import (AlignParams, ReferenceIndex,
                                        parse_pair)
from vclust_tpu.ops import align_tpu


def exact_position_credit(q_codes, r_codes, params):
    """Per-query-position 'matched' credit from the exact parse: inside
    each accepted alignment, positions matching on the local factor
    diagonal. Returns (match_flags, covered_flags, alignments)."""
    ref = ReferenceIndex(r_codes, params)
    factors_rec = []
    alns = parse_pair(q_codes, ref, params, record_factors=factors_rec)
    nq = len(q_codes)
    m = np.zeros(nq, dtype=bool)
    cov = np.zeros(nq, dtype=bool)
    strands = [ref.fwd, ref.rc]
    for a, (strand, factors) in zip(alns, factors_rec):
        cov[a.qstart:a.qend + 1] = True
        rseq = strands[strand]
        for fi, (qs, qe, rs, re_) in enumerate(factors):
            d = rs - qs
            nxt = factors[fi + 1][0] if fi + 1 < len(factors) else qe + 1
            for i in range(qs, min(nxt, nq)):
                j = i + d
                if 0 <= j < len(rseq):
                    m[i] = (q_codes[i] == rseq[j]) and q_codes[i] < 4
        qs0 = factors[0][0]
        d0 = factors[0][2] - factors[0][0]
        for i in range(a.qstart, qs0):
            j = i + d0
            if 0 <= j < len(rseq):
                m[i] = (q_codes[i] == rseq[j]) and q_codes[i] < 4
    return m, cov, alns, factors_rec


def tpu_debug_pair(q_codes, r_codes, params):
    """Debug dict of the TPU row core for one directed pair (K=1)."""
    import jax
    import jax.numpy as jnp
    idx = align_tpu.GenomeIndexTPU([np.asarray(q_codes, np.int8),
                                    np.asarray(r_codes, np.int8)])
    Lq = Lr = max(align_tpu._pad_bucket(len(q_codes)),
                  align_tpu._pad_bucket(len(r_codes)))
    b = idx.ensure(Lq, [0, 1])
    bq = br = b
    qrow, rrow = b['rows'][0], b['rows'][1]
    core = jax.jit(partial(
        align_tpu._row_core, Lq=Lq, Lr=Lr, K=1, mqd=params.mqd,
        mrd=params.mrd, reg=params.reg, pack_bits=br['pack_bits'],
        debug=True))
    return core(br['sv_f'][rrow], br['pk1_f'][rrow], br['pk2_f'][rrow],
                br['sv_r'][rrow], br['pk1_r'][rrow], br['pk2_r'][rrow],
                br['r2dov'][rrow], jnp.int32(len(r_codes)),
                bq['fwd'][qrow:qrow + 1], bq['qsv'][qrow:qrow + 1],
                bq['qoff'][qrow:qrow + 1],
                jnp.array([len(q_codes)], np.int32))


def main():
    qname, rname = sys.argv[1], sys.argv[2]
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    by_name = {g.name: g for g in genomes}
    q_codes = _genome_codes(by_name[qname])
    r_codes = _genome_codes(by_name[rname])
    params = AlignParams()

    em, ecov, alns, factors_rec = exact_position_credit(
        q_codes, r_codes, params)
    print(f'exact: {len(alns)} alignments, sum_match='
          f'{sum(a.nt_match for a in alns)}, '
          f'sum_alnlen={sum(a.alnlen for a in alns)}, '
          f'raster credit={em.sum()}')

    dbg = tpu_debug_pair(q_codes, r_codes, params)
    nq = len(q_codes)
    tm = np.asarray(dbg['m'][0])[:nq]
    tacc = np.asarray(dbg['acc_cov'][0])[:nq]
    D = np.asarray(dbg['D'][0])
    S = np.asarray(dbg['S'][0])
    A = np.asarray(dbg['A'][0])
    vb = np.asarray(dbg['vb'][0])
    print(f"tpu:   n_alns={int(dbg['n_alns'][0])}, "
          f"sum_match={int(dbg['sum_match'][0])}, "
          f"sum_alnlen={int(dbg['sum_alnlen'][0])}")

    tmc = tm & tacc
    print(f'tpu raster matches (in accepted regions): {tmc.sum()}')
    F = align_tpu.FINE
    nb = nq // F + 1
    print('block  qlo   exact_m tpu_m  exact_cov tpu_cov  D      S A votes')
    for b in range(nb):
        lo, hi = b * F, min((b + 1) * F, nq)
        e, t = em[lo:hi].sum(), tmc[lo:hi].sum()
        if abs(int(e) - int(t)) > 8:
            print(f'{b:5d} {lo:6d} {e:7d} {t:6d} {ecov[lo:hi].sum():9d} '
                  f'{tacc[lo:hi].sum():7d}  {D[b]:6d} {int(S[b])} '
                  f'{int(A[b])} {vb[b]:5d}')
    print('\nexact alignments (q spans, strand, factor diags):')
    for a, (strand, factors) in zip(alns, factors_rec):
        if a.alnlen >= 200:
            print(f'  q[{a.qstart}:{a.qend}] strand={a.strand} '
                  f'nt_match={a.nt_match} alnlen={a.alnlen} '
                  f'diags={sorted(set(rs - qs for qs, qe, rs, re_ in factors))[:6]}')


if __name__ == '__main__':
    main()
