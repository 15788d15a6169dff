#!/usr/bin/env python
"""Round-3 gap-credit inference: fit the two PARITY_NOTES candidates.

Extends tools/gap_probe2.py with the untried hypothesis families for
lz-ani's inter-factor gap scoring (golden ani.aln.tsv is the oracle;
a "gap case" is a golden alignment whose boundaries our parse reproduces
with exactly two factors, so golden nt_match determines the gap credit
exactly):

  A. Needleman-Wunsch parameter sweep (linear and affine gap costs) over
     the gap subsequences — "banded DP between factor ends" without the
     window constraint, fitted across a grid of (match, mismatch,
     gap-open, gap-extend) scores; the credit is the number of matches on
     the optimal path (ties resolved toward more matches).
  B. Multi-diagonal split: the 'split' rule generalized to intermediate
     diagonals carrying an exact run of >= L bases (L < msl — internal
     re-anchoring with sub-minimum seeds). Monotone diagonal path, free
     switches, max matches.
  C. ar-trimmed dual window extension: factor 1's approximate extension
     forward along its diagonal + factor 2's backward, each trimmed to
     end with a run of >= ar matches (the engines' own extension rule),
     capped so the two extensions cannot overlap.

Prints exclusive-fit histograms over all dissected gaps.
"""
import itertools
import sys
from collections import Counter

sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import _genome_codes
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


def collect_cases(params):
    """Yield (gq, gr, m1, m2, credit) per dissected single-gap alignment."""
    gold = load_gold(example_path('output', 'ani.aln.tsv'))
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    by_name = {g.name: g for g in genomes}
    cases = []
    for qn, rn in sorted(gold):
        q = _genome_codes(by_name[qn])
        ref = ReferenceIndex(_genome_codes(by_name[rn]), params)
        fs = []
        alns = parse_pair(q, ref, params, record_factors=fs)
        nr = ref.n
        for a, (strand, factors) in zip(alns, fs):
            if len(factors) != 2:
                continue
            key = (a.qstart, a.qend, a.rstart, a.rend)
            gm = gold.get((qn, rn), {}).get(key)
            if gm is None:
                continue
            rseq = (ref.fwd, ref.rc)[strand]
            (q1s, q1e, r1s, r1e), (q2s, q2e, r2s, r2e) = factors
            gap = q2s - q1e - 1
            if gap <= 0:
                continue

            def span_matches(qs, qe, rs):
                if qe < qs:
                    return 0
                d = rs - qs
                seg = q[qs:qe + 1]
                rj = np.arange(qs, qe + 1) + d
                ok = (rj >= 0) & (rj < nr)
                out = np.zeros(len(seg), bool)
                out[ok] = (seg[ok] == rseq[rj[ok]]) & (seg[ok] < 4)
                return int(out.sum())

            f1 = span_matches(q1s, q1e, r1s)
            f2 = span_matches(q2s, q2e, r2s)
            bext = span_matches(a.qstart, q1s - 1,
                                r1s - (q1s - a.qstart)) \
                if a.qstart < q1s else 0
            credit = gm[0] - f1 - f2 - bext
            gq = q[q1e + 1:q2s]
            gr = rseq[r1e + 1:r2s]
            pos = np.arange(q1e + 1, q2s)
            d1 = r1s - q1s
            d2 = r2s - q2s

            def mask(d):
                rj = pos + d
                ok = (rj >= 0) & (rj < nr)
                out = np.zeros(gap, bool)
                out[ok] = (gq[ok] == rseq[rj[ok]]) & (gq[ok] < 4)
                return out

            cases.append(dict(gq=gq, gr=gr, m1=mask(d1), m2=mask(d2),
                              credit=credit, dshift=d2 - d1,
                              qn=qn, rn=rn))
    return cases


# ---------------------------------------------------------------------------
# hypothesis A: NW sweep (linear + affine)
# ---------------------------------------------------------------------------

def nw_affine_matches(gq, gr, ms, mm, go, ge):
    """Matches on the best-scoring global path; ties -> more matches."""
    L1, L2 = len(gq), len(gr)
    NEG = -10 ** 6
    # three states: M (diag), X (gap in ref / query consumed), Y
    sc_m = np.full(L2 + 1, NEG, np.int64)
    sc_x = np.full(L2 + 1, NEG, np.int64)
    sc_y = np.full(L2 + 1, NEG, np.int64)
    mt_m = np.zeros(L2 + 1, np.int64)
    mt_x = np.zeros(L2 + 1, np.int64)
    mt_y = np.zeros(L2 + 1, np.int64)
    sc_m[0] = 0
    for jj in range(1, L2 + 1):
        sc_y[jj] = go + ge * (jj - 1)
    for ii in range(1, L1 + 1):
        p_m, p_x, p_y = sc_m.copy(), sc_x.copy(), sc_y.copy()
        pm_m, pm_x, pm_y = mt_m.copy(), mt_x.copy(), mt_y.copy()
        sc_m[0] = NEG
        sc_x[0] = go + ge * (ii - 1)
        mt_x[0] = 0
        sc_y[0] = NEG
        eq = (gr == gq[ii - 1]) & (gq[ii - 1] < 4) if L2 else \
            np.zeros(0, bool)
        for jj in range(1, L2 + 1):
            sub = ms if eq[jj - 1] else mm
            add = 1 if eq[jj - 1] else 0
            # M from best of prev states at (ii-1, jj-1)
            best_prev = max(p_m[jj - 1], p_x[jj - 1], p_y[jj - 1])
            cand_m = max(x for s, x in ((p_m[jj - 1], pm_m[jj - 1]),
                                        (p_x[jj - 1], pm_x[jj - 1]),
                                        (p_y[jj - 1], pm_y[jj - 1]))
                         if s == best_prev)
            sc_m[jj] = best_prev + sub
            mt_m[jj] = cand_m + add
            # X: consume query (gap in reference), from (ii-1, jj)
            ox = p_m[jj] + go
            ex = p_x[jj] + ge
            sc_x[jj] = max(ox, ex)
            mt_x[jj] = max(x for s, x in ((ox, pm_m[jj]), (ex, pm_x[jj]))
                           if s == sc_x[jj])
            # Y: consume reference, from (ii, jj-1)
            oy = sc_m[jj - 1] + go
            ey = sc_y[jj - 1] + ge
            sc_y[jj] = max(oy, ey)
            mt_y[jj] = max(x for s, x in ((oy, mt_m[jj - 1]),
                                          (ey, mt_y[jj - 1]))
                           if s == sc_y[jj])
    best = max(sc_m[L2], sc_x[L2], sc_y[L2])
    return max(x for s, x in ((sc_m[L2], mt_m[L2]), (sc_x[L2], mt_x[L2]),
                              (sc_y[L2], mt_y[L2])) if s == best)


# ---------------------------------------------------------------------------
# hypothesis B: multi-diagonal split via sub-msl runs
# ---------------------------------------------------------------------------

def multi_split(gq, gr, m1, m2, min_run):
    """Max matches over a monotone multi-diagonal path: diagonals are d1,
    d2, plus every diagonal of the gap-vs-gap matrix carrying an exact
    run of >= min_run. The path consumes query positions left to right,
    switching diagonals only forward in the reference."""
    gap = len(gq)
    nr = len(gr)
    # candidate diagonals in gap-local coordinates: query i matches
    # gr[i + d] for d in [-(gap-1), nr-1]; d1_local corresponds to m1
    # (ref continues right after factor 1) = 0... m1/m2 are precomputed
    # masks on the two factor diagonals (may run outside the gap-vs-gap
    # box); intermediate diagonals live inside the box.
    diag_masks = [m1.astype(np.int64)]
    for d in range(-(gap - 1), nr):
        idx = np.arange(gap)
        rj = idx + d
        ok = (rj >= 0) & (rj < nr)
        if not ok.any():
            continue
        mk = np.zeros(gap, bool)
        mk[ok] = (gq[ok] == gr[rj[ok]]) & (gq[ok] < 4)
        # exact run >= min_run?
        run = 0
        has = False
        for x in mk:
            run = run + 1 if x else 0
            if run >= min_run:
                has = True
                break
        if has:
            diag_masks.append(mk.astype(np.int64))
    diag_masks.append(m2.astype(np.int64))
    # prefix sums; path = choose switch points 0 <= t1 <= t2 ... across
    # the ordered diagonal list (monotone switching approximation).
    # DP over (diagonal, position): best matches using diagonals up to k.
    n_d = len(diag_masks)
    cum = [np.concatenate([[0], np.cumsum(mk)]) for mk in diag_masks]
    # best[k][t] = max matches covering positions < t using diags 0..k in
    # order
    best = cum[0].copy()
    for k2 in range(1, n_d):
        c = cum[k2]
        # switch to diag k2 at position s: best[s] + (c[t] - c[s])
        base = best - c
        run_max = np.maximum.accumulate(base)
        best = np.maximum(best, run_max + c)
    return int(best[gap])


# ---------------------------------------------------------------------------
# hypothesis C: ar-trimmed dual window extension
# ---------------------------------------------------------------------------

def window_ext_trim(mask, aw, am, ar):
    """Forward approximate extension along mask with the trailing-window
    rule, then trimmed so it ends with a run of >= ar matches. Returns
    (consumed_len, matches)."""
    win = []
    mism = 0
    hist = []
    for x in mask:
        f = 0 if x else 1
        win.append(f)
        mism += f
        if len(win) > aw:
            mism -= win.pop(0)
        if mism > am:
            break
        hist.append(1 if x else 0)
    run = 0
    cut = 0
    for p in range(len(hist) - 1, -1, -1):
        if hist[p]:
            run += 1
            if run >= ar:
                cut = p + run
                break
        else:
            run = 0
    hist = hist[:cut]
    return len(hist), sum(hist)


def main():
    params = AlignParams()
    cases = collect_cases(params)
    print(f'{len(cases)} dissected single-gap cases')

    # --- A: NW sweep ---
    grid = []
    for ms in (1, 2, 3, 5):
        for mm in (-1, -2, -3, -5):
            for go in (-1, -2, -3, -4, -6):
                for ge in (None, -1, -2):   # None = linear (ge = go)
                    grid.append((ms, mm, go, go if ge is None else ge))
    grid = sorted(set(grid))
    small = [c for c in cases
             if len(c['gq']) * max(len(c['gr']), 1) <= 20000]
    print(f'NW sweep over {len(grid)} configs x {len(small)} cases '
          f'(area-capped)')
    results = Counter()
    for (ms, mm, go, ge) in grid:
        hits = sum(1 for c in small
                   if nw_affine_matches(c['gq'], c['gr'], ms, mm, go, ge)
                   == c['credit'])
        results[(ms, mm, go, ge)] = hits
    print('top NW configs (hits / cases):')
    for cfg, hits in results.most_common(10):
        print(f'  ms={cfg[0]} mm={cfg[1]} go={cfg[2]} ge={cfg[3]}: '
              f'{hits}/{len(small)}')

    # --- B: multi-diagonal split ---
    for min_run in (4, 5, 6):
        hits = eq0 = 0
        for c in cases:
            got = multi_split(c['gq'], c['gr'], c['m1'], c['m2'], min_run)
            hits += got == c['credit']
            eq0 += got >= c['credit']
        print(f'multi-split min_run={min_run}: exact {hits}/{len(cases)} '
              f'(>=credit {eq0})')

    # --- C: trimmed dual window extension ---
    p = params
    for cap in (False, True):
        hits = 0
        for c in cases:
            l1, c1 = window_ext_trim(c['m1'], p.aw, p.am, p.ar)
            l2, c2 = window_ext_trim(c['m2'][::-1], p.aw, p.am, p.ar)
            if cap and l1 + l2 > len(c['gq']):
                # clip the overlap from the weaker side
                over = l1 + l2 - len(c['gq'])
                l2c = max(l2 - over, 0)
                c2 = int(np.sum(c['m2'][::-1][:l2c]))
            hits += (c1 + c2) == c['credit']
        print(f'dual window-ext trimmed cap={cap}: {hits}/{len(cases)}')

    # --- combined histogram: which credit value families remain ---
    unexplained = 0
    for c in cases:
        cands = {multi_split(c['gq'], c['gr'], c['m1'], c['m2'], 5)}
        l1, c1 = window_ext_trim(c['m1'], p.aw, p.am, p.ar)
        l2, c2 = window_ext_trim(c['m2'][::-1], p.aw, p.am, p.ar)
        cands.add(c1 + c2)
        if c['credit'] not in cands:
            unexplained += 1
    print(f'unexplained by B(5) | C: {unexplained}/{len(cases)}')


if __name__ == '__main__':
    main()
