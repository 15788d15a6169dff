#!/usr/bin/env python
"""Analyze alignment-level differences between my aln.tsv and the golden one.

Categorizes per directed pair:
  - missing: golden alignments absent from mine (by boundary key)
  - extra:   mine absent from golden
  - counts:  boundary matches whose nt_match/nt_mismatch differ
and reports near-miss pairing (missing vs extra with close boundaries) to
expose systematic parse differences.
"""

import sys
from collections import defaultdict

sys.path.insert(0, '.')
from vclust_tpu.utils.data import example_path  # noqa: E402


def load(path):
    by_pair = defaultdict(list)
    with open(path) as fh:
        fh.readline()
        for line in fh:
            t = line.rstrip('\n').split('\t')
            key = (t[0], t[1])
            by_pair[key].append(dict(
                pident=float(t[2]), alnlen=int(t[3]),
                qs=int(t[4]), qe=int(t[5]), rs=int(t[6]), re=int(t[7]),
                m=int(t[8]), mm=int(t[9])))
    return by_pair


def main():
    gold = load(sys.argv[1] if len(sys.argv) > 1
                else example_path('output', 'ani.aln.tsv'))
    mine = load(sys.argv[2] if len(sys.argv) > 2
                else '/tmp/parity/ani.aln.tsv')

    tot_missing = tot_extra = tot_cnt = tot_exact = 0
    near = []          # (pair, golden aln, closest mine aln)
    pair_stats = []
    for pair in sorted(set(gold) | set(mine)):
        g = gold.get(pair, [])
        m = mine.get(pair, [])
        gkeys = {(a['qs'], a['qe'], a['rs'], a['re']): a for a in g}
        mkeys = {(a['qs'], a['qe'], a['rs'], a['re']): a for a in m}
        missing = [gkeys[k] for k in gkeys if k not in mkeys]
        extra = [mkeys[k] for k in mkeys if k not in gkeys]
        both = [k for k in gkeys if k in mkeys]
        cnt_diff = [k for k in both
                    if (gkeys[k]['m'], gkeys[k]['mm'])
                    != (mkeys[k]['m'], mkeys[k]['mm'])]
        tot_missing += len(missing)
        tot_extra += len(extra)
        tot_cnt += len(cnt_diff)
        tot_exact += len(both) - len(cnt_diff)
        if missing or extra or cnt_diff:
            pair_stats.append((pair, len(g), len(m), len(missing),
                               len(extra), len(cnt_diff)))
        # near-miss pairing: same strand-ish, overlapping query span
        for ga in missing:
            best = None
            for ma in extra:
                ov = min(ga['qe'], ma['qe']) - max(ga['qs'], ma['qs'])
                if ov > 0:
                    d = (abs(ga['qs'] - ma['qs']) + abs(ga['qe'] - ma['qe'])
                         + abs(ga['rs'] - ma['rs']) + abs(ga['re'] - ma['re']))
                    if best is None or d < best[0]:
                        best = (d, ma)
            near.append((pair, ga, best[1] if best else None))

    print(f'pairs-with-diffs {len(pair_stats)}  missing {tot_missing}  '
          f'extra {tot_extra}  count-diffs {tot_cnt}  exact {tot_exact}')
    print('\nworst pairs (q, r, n_gold, n_mine, miss, extra, cntdiff):')
    for row in sorted(pair_stats, key=lambda r: -(r[3] + r[4] + r[5]))[:12]:
        print(' ', row)

    show = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    print(f'\nnear-miss detail (first {show}):')
    for pair, ga, ma in near[:show]:
        gs = f"G q[{ga['qs']},{ga['qe']}] r[{ga['rs']},{ga['re']}] " \
             f"len={ga['alnlen']} m={ga['m']} mm={ga['mm']}"
        if ma:
            ms = f"M q[{ma['qs']},{ma['qe']}] r[{ma['rs']},{ma['re']}] " \
                 f"len={ma['alnlen']} m={ma['m']} mm={ma['mm']}"
        else:
            ms = 'M (none overlapping)'
        print(f'  {pair[0]} vs {pair[1]}\n    {gs}\n    {ms}')


if __name__ == '__main__':
    main()
