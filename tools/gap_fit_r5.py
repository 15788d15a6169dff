#!/usr/bin/env python
"""Round-5 gap-credit experiment: greedy short-seed re-parse (the named
next step in tools/PARITY_NOTES.md).

Hypothesis: between two factors, lz-ani re-parses the gap with seeds
SHORTER than msl: window-extend along the current diagonal (aw/am), then
jump to the earliest exact k0-mer on a nearby diagonal (ties preferring
the diagonal closest to the current one), repeat; finally the next
factor's backward extension along d2 claims the tail. Swept dimensions:

  k0      in 3..6      internal seed length
  J       in 0,2,4,8   diagonal slack beyond [d1, d2] (micro-detours —
                       the same-diagonal gaps with credit > own matches
                       force J > 0)
  pref    near | low   jump tie rule: nearest diagonal vs smallest shift
  tail    clip | sum   overlap rule for d2's backward extension
  ar      0 | 3        trim extension to end on a >= ar match run

Observation model (as in gap_fit.load): ref base for gap query position
p on diagonal offset delta (vs d1) is full[p + delta]; out-of-span = no
match. Run: python tools/gap_fit_r5.py [corpus.npz]
"""
import sys
from collections import Counter

sys.path.insert(0, '.')
sys.path.insert(0, 'tools')
import numpy as np

from gap_fit import load, win_ext


def eq_matrix(gq, full, dmin, dmax):
    """(gap, dmax-dmin+1) bool: gq[p] matches full[p+delta]."""
    gap = len(gq)
    W = dmax - dmin + 1
    out = np.zeros((gap, W), bool)
    L = len(full)
    for w in range(W):
        d = dmin + w
        lo = max(0, -d)
        hi = min(gap, L - d)
        if hi > lo:
            seg = full[lo + d:hi + d]
            out[lo:hi, w] = (gq[lo:hi] == seg) & (gq[lo:hi] < 4)
    return out


def seed_matrix(eq, k0):
    """(gap, W) bool: an exact k0-run of matches starts at (p, delta)."""
    m = eq.copy()
    for j in range(1, k0):
        sh = np.zeros_like(eq)
        sh[:-j] = eq[j:]
        m &= sh
    return m


def greedy(gq, full, s, k0, J, pref, tail, ar, aw=15, am=7):
    gap = len(gq)
    dmin = min(0, s) - J
    dmax = max(0, s) + J
    eq = eq_matrix(gq, full, dmin, dmax)
    seeds = seed_matrix(eq, k0) if gap >= k0 else np.zeros_like(eq)
    cur = -dmin              # column of delta=0 (d1)
    p = 0
    total = 0
    consumed_to = 0
    guard = 0
    while p < gap and guard < 64:
        guard += 1
        mask = eq[p:, cur]
        f_m, f_len = win_ext(mask, aw, am, ar)
        total += f_m
        p = p + max(f_len, 0)
        consumed_to = p
        if p >= gap:
            break
        # next short seed at smallest p' >= p + 1 (progress), tie by pref
        rows = np.nonzero(seeds[p + 1:].any(axis=1))[0] if p + 1 < gap \
            else np.array([], int)
        if not len(rows):
            break
        pn = p + 1 + rows[0]
        cols = np.nonzero(seeds[pn])[0]
        if pref == 'near':
            nxt = cols[np.argmin(np.abs(cols - cur))]
        else:
            nxt = cols[0]
        p, cur = pn, int(nxt)
    # backward extension of factor 2 along d2
    col2 = s - dmin
    b_m, b_len = win_ext(eq[::-1, col2], aw, am, ar)
    if tail == 'sum':
        total += b_m
    else:
        b_start = gap - b_len
        if b_start < consumed_to:
            b_start = consumed_to
        total += int(eq[b_start:, col2].sum())
    return total


def main():
    obs = load(sys.argv[1] if len(sys.argv) > 1 else '/tmp/gapcorpus.npz')
    n = len(obs)
    hyps = []
    for k0 in (3, 4, 5, 6):
        for J in (0, 2, 4, 8):
            for pref in ('near', 'low'):
                for tail in ('clip', 'sum'):
                    for ar in (0, 3):
                        hyps.append((k0, J, pref, tail, ar))
    fits = Counter()
    errs = {h: [] for h in hyps}
    for o in obs:
        for h in hyps:
            k0, J, pref, tail, ar = h
            p = greedy(o['gq'], o['full'], o['s'], k0, J, pref, tail, ar)
            errs[h].append(p - o['credit'])
            if p == o['credit']:
                fits[h] += 1
    print(f'{n} observations; greedy short-seed exact-fit (top 20; '
          f'baseline prev=30.5% split=28.8%):')
    for h, c in fits.most_common(20):
        e = np.array(errs[h])
        print(f'  {c:5d} ({100*c/n:5.1f}%)  mean={e.mean():+6.2f} '
              f'mae={np.abs(e).mean():5.2f}  k0={h[0]} J={h[1]} '
              f'pref={h[2]} tail={h[3]} ar={h[4]}')


if __name__ == '__main__':
    main()
