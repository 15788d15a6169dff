#!/usr/bin/env python
"""Infer lz-ani's inter-factor gap handling from single-gap alignments.

For every golden alignment whose boundaries my parse reproduces with a
chain of EXACTLY two factors (one gap), the golden nt_match determines the
gap's credit exactly:  credit = gold_m - factor_matches.  Print, per such
gap: (gap_len, diag_shift, credit, prev-policy credit, next-policy credit,
split-policy credit, full per-position match masks on both diagonals) and
aggregate which closed-form rule explains the observations.
"""
import sys
from collections import Counter

sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import _genome_codes, order_objects
from vclust_tpu.ops.lz_parse_py import (AlignParams, ReferenceIndex,
                                        parse_pair)


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
    rules = Counter()
    printed = 0
    pairs = sorted({p for p in gold})
    for qn, rn in pairs[:40]:
        q = _genome_codes(by_name[qn])
        ref = ReferenceIndex(_genome_codes(by_name[rn]), params)
        fs = []
        alns = parse_pair(q, ref, params, record_factors=fs)
        nr = ref.n
        for a, (strand, factors) in zip(alns, fs):
            if len(factors) != 2:
                continue
            # my boundaries in golden coords
            if strand == 0:
                key = (a.qstart, a.qend, a.rstart, a.rend)
            else:
                key = (a.qstart, a.qend, a.rstart, a.rend)
            gm = gold.get((qn, rn), {}).get(key)
            if gm is None:
                continue
            rseq = (ref.fwd, ref.rc)[strand]
            (q1s, q1e, r1s, r1e), (q2s, q2e, r2s, r2e) = factors
            gap = q2s - q1e - 1
            if gap <= 0:
                continue
            fmatch = a.nt_match  # includes my 'prev' gap credit; recompute
            # factor-only matches: positions inside factors
            def span_matches(qs, qe, rs):
                d = rs - qs
                seg = q[qs:qe + 1]
                rj = np.arange(qs, qe + 1) + d
                ok = (rj >= 0) & (rj < nr)
                out = np.zeros(len(seg), bool)
                out[ok] = (seg[ok] == rseq[rj[ok]]) & (seg[ok] < 4)
                return int(out.sum())
            f1 = span_matches(q1s, q1e, r1s)
            f2 = span_matches(q2s, q2e, r2s)
            # back-extension part (before q1s down to a.qstart)
            bext = span_matches(a.qstart, q1s - 1, r1s - (q1s - a.qstart)) \
                if a.qstart < q1s else 0
            credit = gm[0] - f1 - f2 - bext
            gq = q[q1e + 1:q2s]
            d1 = r1s - q1s
            d2 = r2s - q2s
            pos = np.arange(q1e + 1, q2s)
            def mask(d):
                rj = pos + d
                ok = (rj >= 0) & (rj < nr)
                out = np.zeros(gap, bool)
                out[ok] = (gq[ok] == rseq[rj[ok]]) & (gq[ok] < 4)
                return out
            m1, m2 = mask(d1), mask(d2)
            prev_c = int(m1.sum())
            next_c = int(m2.sum())
            pc = np.concatenate([[0], np.cumsum(m1)])
            nc = np.concatenate([[0], np.cumsum(m2[::-1])])[::-1]
            split_c = int((pc + nc).max())
            # LCS of the query gap vs the reference gap (global edit path
            # with free gaps, match-count objective).
            gr = rseq[r1e + 1:r2s]
            L1, L2 = len(gq), len(gr)
            dp = np.zeros((L1 + 1, L2 + 1), np.int32)
            for ii in range(1, L1 + 1):
                eq = (gr == gq[ii - 1]) & (gq[ii - 1] < 4)
                row = dp[ii]
                prow = dp[ii - 1]
                for jj in range(1, L2 + 1):
                    row[jj] = max(prow[jj], row[jj - 1],
                                  prow[jj - 1] + (1 if eq[jj - 1] else 0))
            lcs_c = int(dp[L1, L2])

            def nw_matches(ms, mm, gp):
                NEG = -10 ** 6
                sc = np.full((L1 + 1, L2 + 1), NEG, np.int32)
                mt = np.zeros((L1 + 1, L2 + 1), np.int32)  # matches on path
                sc[0, :] = gp * np.arange(L2 + 1)
                sc[:, 0] = gp * np.arange(L1 + 1)
                for ii in range(1, L1 + 1):
                    eq = (gr == gq[ii - 1]) & (gq[ii - 1] < 4)
                    for jj in range(1, L2 + 1):
                        diag = sc[ii - 1, jj - 1] + (ms if eq[jj - 1]
                                                     else mm)
                        up = sc[ii - 1, jj] + gp
                        left = sc[ii, jj - 1] + gp
                        best = max(diag, up, left)
                        sc[ii, jj] = best
                        # among equal scores prefer the path with MORE
                        # matches (secondary objective)
                        cand = []
                        if diag == best:
                            cand.append(mt[ii - 1, jj - 1]
                                        + (1 if eq[jj - 1] else 0))
                        if up == best:
                            cand.append(mt[ii - 1, jj])
                        if left == best:
                            cand.append(mt[ii, jj - 1])
                        mt[ii, jj] = max(cand)
                return int(mt[L1, L2])

            nw111 = nw_matches(1, -1, -1)
            nw112 = nw_matches(1, -1, -2)
            nw211 = nw_matches(2, -1, -1)

            def window_ext(mask, aw=15, am=7):
                """Matches consumed by approx extension along mask until
                the trailing window rule fails (no trim)."""
                win = []
                mism = 0
                tot = 0
                for x in mask:
                    f = 0 if x else 1
                    win.append(f)
                    mism += f
                    if len(win) > aw:
                        mism -= win.pop(0)
                    if mism > am:
                        break
                    tot += 1 if x else 0
                return tot

            dc = window_ext(m1) + window_ext(m2[::-1])
            tag = []
            if credit == dc:
                tag.append('dc')
            if credit == nw111:
                tag.append('nw111')
            if credit == nw112:
                tag.append('nw112')
            if credit == nw211:
                tag.append('nw211')
            if credit == prev_c:
                tag.append('prev')
            if credit == next_c:
                tag.append('next')
            if credit == split_c:
                tag.append('split')
            if credit == lcs_c:
                tag.append('lcs')
            rules[tuple(tag) or ('other',)] += 1
            if printed < 30 and not tag:
                m1s = ''.join('1' if x else '0' for x in m1)
                m2s = ''.join('1' if x else '0' for x in m2)
                print(f'{qn}/{rn} q[{a.qstart},{a.qend}] gap={gap} '
                      f'dshift={d2-d1} credit={credit} prev={prev_c} '
                      f'next={next_c} split={split_c} lcs={lcs_c} '
                      f'nw111={nw111} nw112={nw112} nw211={nw211}')
                print(f'  m1={m1s}')
                print(f'  m2={m2s}')
                printed += 1
    print('\nrule histogram over single-gap alignments:')
    for k, v in rules.most_common():
        print(' ', k, v)


if __name__ == '__main__':
    main()
