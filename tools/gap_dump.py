#!/usr/bin/env python
"""Dump every isolatable inter-factor gap observation to an npz corpus.

For each golden alignment whose boundaries my parse reproduces, with
EXACTLY two factors (one gap), record the gap's query/reference sequences
on both flanking diagonals, the diagonals, flanking factor tails, and the
exact golden credit (gold nt_match - factor/back-extension matches). The
fit harness (tools/gap_fit.py) sweeps closed-form hypotheses over this
corpus without re-running the parser.
"""
import sys

sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import _genome_codes
from vclust_tpu.ops.lz_parse_py import AlignParams, ReferenceIndex, parse_pair


def load_gold(path):
    by_pair = {}
    with open(path) as fh:
        fh.readline()
        for line in fh:
            t = line.rstrip('\n').split('\t')
            by_pair.setdefault((t[0], t[1]), {})[
                (int(t[4]) - 1, int(t[5]) - 1, int(t[6]) - 1,
                 int(t[7]) - 1)] = (int(t[8]), int(t[9]))
    return by_pair


def main():
    gold = load_gold(example_path('output', 'ani.aln.tsv'))
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    by_name = {g.name: g for g in genomes}
    params = AlignParams()
    out = dict(gq=[], gr1=[], gr2=[], d1=[], d2=[], credit=[], gap=[],
               pre=[], post=[], qn=[], rn=[], qs=[], multi_total=[],
               n_factors=[])
    n_single = n_multi = 0
    for (qn, rn), gmap in sorted(gold.items()):
        q = _genome_codes(by_name[qn])
        ref = ReferenceIndex(_genome_codes(by_name[rn]), params)
        fs = []
        alns = parse_pair(q, ref, params, record_factors=fs)
        nr = ref.n
        for a, (strand, factors) in zip(alns, fs):
            key = (a.qstart, a.qend, a.rstart, a.rend)
            gm = gmap.get(key)
            if gm is None or len(factors) < 2:
                continue
            rseq = (ref.fwd, ref.rc)[strand]

            def span_matches(qs, qe, rs):
                if qe < qs:
                    return 0
                d = rs - qs
                seg = q[qs:qe + 1]
                rj = np.arange(qs, qe + 1) + d
                ok = (rj >= 0) & (rj < nr)
                m = np.zeros(len(seg), bool)
                m[ok] = (seg[ok] == rseq[rj[ok]]) & (seg[ok] < 4)
                return int(m.sum())

            # matches inside factors + the leading back-extension
            fsum = sum(span_matches(qs_, qe_, rs_)
                       for (qs_, qe_, rs_, _re) in factors)
            q1s = factors[0][0]
            bext = span_matches(a.qstart, q1s - 1,
                                factors[0][2] - (q1s - a.qstart)) \
                if a.qstart < q1s else 0
            credit_total = gm[0] - fsum - bext
            if len(factors) != 2:
                n_multi += 1
                continue
            n_single += 1
            (q1s, q1e, r1s, r1e), (q2s, q2e, r2s, r2e) = factors
            gap = q2s - q1e - 1
            if gap <= 0:
                continue
            d1 = r1s - q1s
            d2 = r2s - q2s
            CTX = 48
            gq = q[q1e + 1:q2s]

            def refspan(lo, hi):
                lo_c, hi_c = max(lo, 0), min(hi, nr)
                seg = np.full(hi - lo, 4, np.int8)
                seg[lo_c - lo:hi_c - lo] = rseq[lo_c:hi_c]
                return seg

            # reference along d1 / d2 over the gap, plus factor tails
            out['gq'].append(gq.astype(np.int8))
            out['gr1'].append(refspan(q1e + 1 + d1, q2s + d1))
            out['gr2'].append(refspan(q1e + 1 + d2, q2s + d2))
            out['pre'].append(q[max(q1e + 1 - CTX, 0):q1e + 1]
                              .astype(np.int8))
            out['post'].append(q[q2s:q2s + CTX].astype(np.int8))
            out['d1'].append(d1)
            out['d2'].append(d2)
            out['credit'].append(credit_total)
            out['gap'].append(gap)
            out['qn'].append(qn)
            out['rn'].append(rn)
            out['qs'].append(a.qstart)
            out['multi_total'].append(0)
            out['n_factors'].append(2)
    arrs = {}
    for k, v in out.items():
        if k in ('gq', 'gr1', 'gr2', 'pre', 'post'):
            arrs[k] = np.array([x.tobytes() for x in v], dtype=object)
        else:
            arrs[k] = np.array(v)
    np.savez(sys.argv[1] if len(sys.argv) > 1 else '/tmp/gapcorpus.npz',
             **arrs, allow_pickle=True)
    print(f'single-gap observations: {len(out["gap"])} '
          f'(alignments: single={n_single} multi={n_multi})')


if __name__ == '__main__':
    main()
