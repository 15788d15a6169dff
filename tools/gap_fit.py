#!/usr/bin/env python
"""Sweep gap-credit hypotheses over the dumped corpus (tools/gap_dump.py).

Each hypothesis maps one observation (gap query seq, reference region,
flanking diagonals) to a predicted match credit; scored by exact-fit rate
and mean absolute error over all 2350 single-gap observations.
"""
import sys
from collections import Counter

sys.path.insert(0, '.')
import numpy as np


def load(path='/tmp/gapcorpus.npz'):
    z = np.load(path, allow_pickle=True)
    obs = []
    n = len(z['gap'])
    for i in range(n):
        gq = np.frombuffer(z['gq'][i], dtype=np.int8)
        gr1 = np.frombuffer(z['gr1'][i], dtype=np.int8)
        gr2 = np.frombuffer(z['gr2'][i], dtype=np.int8)
        d1, d2 = int(z['d1'][i]), int(z['d2'][i])
        s = d2 - d1
        gap = len(gq)
        if s >= 0:
            full = np.concatenate([gr1, gr2[gap - s:]]) if s else gr1
        else:
            full = gr1[:gap + s]
        obs.append(dict(gq=gq, gr1=gr1, gr2=gr2, full=full, s=s,
                        credit=int(z['credit'][i]), gap=gap))
    return obs


def nw_matches(gq, gr, ms, mm, go, ge, tie_max=True):
    """Global alignment; returns matches on the optimal path (ties ->
    most matches). Affine gaps via (go first, ge after); linear when
    go == ge."""
    L1, L2 = len(gq), len(gr)
    NEG = -10**6
    # state 0 = diag, 1 = gap-in-q (consume r), 2 = gap-in-r (consume q)
    sc = np.full((3, L1 + 1, L2 + 1), NEG, np.int64)
    mt = np.zeros((3, L1 + 1, L2 + 1), np.int64)
    sc[0, 0, 0] = 0
    for jj in range(1, L2 + 1):
        sc[1, 0, jj] = go + ge * (jj - 1)
    for ii in range(1, L1 + 1):
        sc[2, ii, 0] = go + ge * (ii - 1)
    for ii in range(1, L1 + 1):
        qi = gq[ii - 1]
        for jj in range(1, L2 + 1):
            eq = (qi == gr[jj - 1]) and qi < 4
            add = ms if eq else mm
            madd = 1 if eq else 0
            # diag
            best, bm = NEG, 0
            for st in range(3):
                v = sc[st, ii - 1, jj - 1]
                if v + add > best or (v + add == best
                                      and tie_max
                                      and mt[st, ii - 1, jj - 1] + madd > bm):
                    best, bm = v + add, mt[st, ii - 1, jj - 1] + madd
            sc[0, ii, jj], mt[0, ii, jj] = best, bm
            # gap in q (consume r): from diag/open or extend
            c1 = sc[0, ii, jj - 1] + go
            c1m = mt[0, ii, jj - 1]
            c2 = sc[1, ii, jj - 1] + ge
            c2m = mt[1, ii, jj - 1]
            if c1 > c2 or (c1 == c2 and tie_max and c1m >= c2m):
                sc[1, ii, jj], mt[1, ii, jj] = c1, c1m
            else:
                sc[1, ii, jj], mt[1, ii, jj] = c2, c2m
            c1 = sc[0, ii - 1, jj] + go
            c1m = mt[0, ii - 1, jj]
            c2 = sc[2, ii - 1, jj] + ge
            c2m = mt[2, ii - 1, jj]
            if c1 > c2 or (c1 == c2 and tie_max and c1m >= c2m):
                sc[2, ii, jj], mt[2, ii, jj] = c1, c1m
            else:
                sc[2, ii, jj], mt[2, ii, jj] = c2, c2m
    st = np.argmax(sc[:, L1, L2])
    return int(mt[st, L1, L2])


def win_ext(mask, aw, am, ar=0, incl=True):
    """Matches consumed by approx extension along mask; optional trim so
    the extension ends with a run of >= ar matches."""
    mism = 0
    hist = []
    stop = len(mask)
    for i, x in enumerate(mask):
        f = 0 if x else 1
        hist.append(f)
        mism += f
        if len(hist) > aw:
            mism -= hist.pop(0)
        if mism > am:
            stop = i if incl else i + 1
            break
    pre = mask[:stop]
    if ar > 0 and len(pre):
        run = 0
        last = -1
        for i, x in enumerate(pre):
            run = run + 1 if x else 0
            if run >= ar:
                last = i
        pre = pre[:last + 1] if last >= 0 else pre[:0]
    return int(np.sum(pre)), len(pre)


def main():
    obs = load(sys.argv[1] if len(sys.argv) > 1 else '/tmp/gapcorpus.npz')
    n = len(obs)
    hyps = {}

    def masks(o):
        m1 = (o['gq'] == o['gr1']) & (o['gq'] < 4)
        m2 = (o['gq'] == o['gr2']) & (o['gq'] < 4)
        return m1, m2

    # --- NW grid ----------------------------------------------------------
    for ms in (1, 2):
        for mm in (0, -1, -2):
            for go, ge in ((-1, -1), (-2, -2), (-2, -1), (-3, -1),
                           (-4, -1), (-3, -3), (-4, -2), (0, 0)):
                key = f'nw(ms={ms},mm={mm},go={go},ge={ge})'
                hyps[key] = ('nw', ms, mm, go, ge)

    # --- window-extension family -----------------------------------------
    for ar in (0, 3):
        for ov in ('sum', 'clip', 'union'):
            hyps[f'wext(ar={ar},{ov})'] = ('wext', ar, ov)
    # split after extensions
    hyps['wext+split'] = ('wextsplit',)
    # plain split / prev / next / lcs baselines
    for b in ('split', 'prev', 'next'):
        hyps[b] = (b,)

    fits = Counter()
    errs = {k: [] for k in hyps}
    for o in obs:
        m1, m2 = masks(o)
        gap = o['gap']
        credit = o['credit']
        pc = np.concatenate([[0], np.cumsum(m1)])
        nc = np.concatenate([np.cumsum(m2[::-1])[::-1], [0]])
        preds = {}
        for key, h in hyps.items():
            if h[0] == 'nw':
                p = nw_matches(o['gq'], o['full'], h[1], h[2], h[3], h[4])
            elif h[0] == 'wext':
                ar, ov = h[1], h[2]
                f_m, f_len = win_ext(m1, 15, 7, ar)
                b_m, b_len = win_ext(m2[::-1], 15, 7, ar)
                if ov == 'sum':
                    p = f_m + b_m
                elif ov == 'clip':
                    b_start = gap - b_len
                    if f_len > b_start:
                        p = int(np.sum(m1[:b_start])) + b_m
                    else:
                        p = f_m + b_m
                else:
                    u = np.zeros(gap, bool)
                    u[:f_len] |= m1[:f_len]
                    if b_len:
                        u[gap - b_len:] |= m2[gap - b_len:]
                    p = int(u.sum())
            elif h[0] == 'wextsplit':
                f_m, f_len = win_ext(m1, 15, 7, 0)
                b_m, b_len = win_ext(m2[::-1], 15, 7, 0)
                lo, hi = 0, gap
                p = int(max(pc[t] + nc[t] for t in range(lo, hi + 1)))
            elif h[0] == 'split':
                p = int(max(pc[t] + nc[t] for t in range(gap + 1)))
            elif h[0] == 'prev':
                p = int(m1.sum())
            elif h[0] == 'next':
                p = int(m2.sum())
            preds[key] = p
            errs[key].append(p - credit)
            if p == credit:
                fits[key] += 1
    print(f'{n} observations; exact-fit counts (top 25):')
    for key, c in fits.most_common(25):
        e = np.array(errs[key])
        print(f'  {c:5d} ({100*c/n:5.1f}%)  mean_err={e.mean():+6.2f} '
              f'mae={np.abs(e).mean():5.2f}  {key}')


if __name__ == '__main__':
    main()
