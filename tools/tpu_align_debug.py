#!/usr/bin/env python
"""Per-position diagnostic for the TPU aligner on one directed pair.

Runs the TPU kernel's dataflow (unjitted pieces) and the exact Python
parse, then reports per-region disagreements: where the exact engine
credits matches that the TPU raster misses, and vice versa.

Usage: JAX_PLATFORMS=cpu python tools/tpu_align_debug.py QNAME RNAME
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import _genome_codes, order_objects
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
        # evaluate on each factor's diagonal across its span + the gap to
        # the next factor (gap evaluated on prev diagonal, policy 'prev')
        for fi, (qs, qe, rs, re_) in enumerate(factors):
            d = rs - qs
            nxt = factors[fi + 1][0] if fi + 1 < len(factors) else qe + 1
            for i in range(qs, min(nxt, nq)):
                j = i + d
                if 0 <= j < len(rseq):
                    m[i] = (q_codes[i] == rseq[j]) and q_codes[i] < 4
        # backward extension part of the alignment (before first factor)
        qs0 = factors[0][0]
        d0 = factors[0][2] - factors[0][0]
        for i in range(a.qstart, qs0):
            j = i + d0
            if 0 <= j < len(rseq):
                m[i] = (q_codes[i] == rseq[j]) and q_codes[i] < 4
    return m, cov, alns, factors_rec


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

    # TPU path intermediates
    import jax.numpy as jnp
    from vclust_tpu.core.seq import revcomp_codes
    Lq = align_tpu._pad_bucket(len(q_codes))
    Lr = align_tpu._pad_bucket(len(r_codes))
    qf = np.full(Lq, 4, np.int8); qf[:len(q_codes)] = q_codes
    rf = np.full(Lr, 4, np.int8); rf[:len(r_codes)] = r_codes
    rr = np.full(Lr, 4, np.int8); rr[:len(r_codes)] = revcomp_codes(r_codes)
    qv, _, _, _, _ = align_tpu._index_block(
        jnp.asarray(qf[None]), jnp.asarray(qf[None]), align_tpu.SEED_K)
    _, sv_f, spos_f, _, _ = align_tpu._index_block(
        jnp.asarray(rf[None]), jnp.asarray(rf[None]), align_tpu.SEED_K)
    _, _, _, sv_r, spos_r = align_tpu._index_block(
        jnp.asarray(rf[None]), jnp.asarray(rr[None]), align_tpu.SEED_K)

    n, sm, sl = align_tpu._pair_direction(
        jnp.asarray(qf), qv[0], jnp.int32(len(q_codes)),
        jnp.asarray(rf), jnp.asarray(rr),
        sv_f[0], spos_f[0], sv_r[0], spos_r[0], jnp.int32(len(r_codes)),
        Lq=Lq, Lr=Lr, mqd=params.mqd, mrd=params.mrd, reg=params.reg)
    print(f'tpu:   n_alns={int(n)}, sum_match={int(sm)}, sum_alnlen={int(sl)}')

    dbg = align_tpu._pair_direction_debug(
        jnp.asarray(qf), qv[0], jnp.int32(len(q_codes)),
        jnp.asarray(rf), jnp.asarray(rr),
        sv_f[0], spos_f[0], sv_r[0], spos_r[0], jnp.int32(len(r_codes)),
        Lq=Lq, Lr=Lr, mqd=params.mqd, mrd=params.mrd, reg=params.reg)
    tm = np.asarray(dbg['m'])[:len(q_codes)]
    tacc = np.asarray(dbg['acc_cov'])[:len(q_codes)]
    D = np.asarray(dbg['D'])
    S = np.asarray(dbg['S'])
    A = np.asarray(dbg['A'])
    vb = np.asarray(dbg['vb'])

    tmc = tm & tacc
    print(f'tpu raster matches (in accepted regions): {tmc.sum()}')
    # blockwise comparison table where they disagree
    B = align_tpu.BLOCK
    nb = len(q_codes) // B + 1
    print('block qlo    exact_m tpu_m  exact_cov tpu_cov  D      S A votes')
    for b in range(nb):
        lo, hi = b * B, min((b + 1) * B, len(q_codes))
        e, t = em[lo:hi].sum(), tmc[lo:hi].sum()
        if abs(int(e) - int(t)) > 8:
            print(f'{b:5d} {lo:6d} {e:7d} {t:6d} {ecov[lo:hi].sum():9d} '
                  f'{tacc[lo:hi].sum():7d}  {D[b]:6d} {int(S[b])} '
                  f'{int(A[b])} {vb[b]:5d}')
    # exact factor diags for reference around the worst blocks
    print('\nexact alignments (q spans, strand, first-factor diag):')
    for a, (strand, factors) in zip(alns, factors_rec):
        if a.alnlen >= 200:
            print(f'  q[{a.qstart}:{a.qend}] strand={a.strand} '
                  f'nt_match={a.nt_match} alnlen={a.alnlen} '
                  f'diags={sorted(set(rs - qs for qs, qe, rs, re_ in factors))[:6]}')


if __name__ == '__main__':
    main()
