#!/usr/bin/env python
"""For alignments whose boundaries match golden but nt_match differs,
reconstruct the factor chain (Python oracle) and test which per-gap credit
rule explains the golden match count.

Hypotheses per alignment:
  m_prev / m_next / m_split / m_mismatch  (global policies)
plus the factor-only sum to expose the golden gap credit directly.
"""

import sys
from collections import Counter, defaultdict

sys.path.insert(0, '.')

import numpy as np                                        # noqa: E402
from vclust_tpu.models.input import load_genomes          # noqa: E402
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import (_genome_codes,       # noqa: E402
                                     order_objects)
from vclust_tpu.ops.lz_parse_py import (AlignParams,      # noqa: E402
                                        ReferenceIndex, parse_pair)


def load_aln(path):
    by_pair = defaultdict(dict)
    with open(path) as fh:
        fh.readline()
        for line in fh:
            t = line.rstrip('\n').split('\t')
            by_pair[(t[0], t[1])][(int(t[4]), int(t[5]), int(t[6]),
                                   int(t[7]))] = (int(t[8]), int(t[9]))
    return by_pair


def gap_credits(q, rseq, a, b):
    """(prev, next, split, npos) match credits for the gap between factors
    a=(qs,qe,rs,re) and b."""
    gap = b[0] - a[1] - 1
    if gap <= 0:
        return 0, 0, 0, 0, 0
    gq = q[a[1] + 1:b[0]]
    prev_cmp = np.zeros(gap, dtype=bool)
    seg = rseq[a[3] + 1:a[3] + 1 + gap]
    prev_cmp[:len(seg)] = (gq[:len(seg)] == seg) & (gq[:len(seg)] < 4)
    nxt_cmp = np.zeros(gap, dtype=bool)
    seg2 = rseq[max(0, b[2] - gap):b[2]]
    nxt_cmp[gap - len(seg2):] = (gq[gap - len(seg2):] == seg2) & \
        (gq[gap - len(seg2):] < 4)
    pc = np.concatenate([[0], np.cumsum(prev_cmp)])
    nc = np.concatenate([[0], np.cumsum(nxt_cmp[::-1])])[::-1]
    either = int((prev_cmp | nxt_cmp).sum())
    return (int(prev_cmp.sum()), int(nxt_cmp.sum()), int((pc + nc).max()),
            either, gap)


def lcs_matches(a, b):
    """Max matches along any edit path between segments a and b (= LCS)."""
    if len(a) == 0 or len(b) == 0:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    for i in range(1, len(a) + 1):
        cur = np.zeros(len(b) + 1, dtype=np.int32)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1] and ai < 4:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return int(prev[-1])


def main():
    gold = load_aln(example_path('output', 'ani.aln.tsv'))
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    order = order_objects(genomes)
    names = [genomes[i].name for i in order]
    codes = {pos: _genome_codes(genomes[order[pos]])
             for pos in range(len(order))}
    params = AlignParams()

    only = sys.argv[1] if len(sys.argv) > 1 else None

    verdicts = Counter()
    residuals = Counter()
    shown = 0
    pair_list = []
    for qpos in range(len(names)):
        for rpos in range(len(names)):
            if qpos == rpos:
                continue
            if (names[qpos], names[rpos]) in gold:
                pair_list.append((qpos, rpos))
    if only:
        qn, rn = only.split(',')
        pair_list = [(names.index(qn), names.index(rn))]

    indexes = {}
    for qpos, rpos in pair_list:
        if rpos not in indexes:
            indexes[rpos] = ReferenceIndex(codes[rpos], params)
        rec = []
        alns = parse_pair(codes[qpos], indexes[rpos], params,
                          record_factors=rec)
        gmap = gold[(names[qpos], names[rpos])]
        nr = len(codes[rpos])
        for a, (strand, factors) in zip(alns, rec):
            key = (a.qstart + 1, a.qend + 1, a.rstart + 1, a.rend + 1)
            if key not in gmap:
                continue
            gm, gmm = gmap[key]
            if gm == a.nt_match:
                verdicts['already-equal'] += 1
                continue
            rseq = indexes[rpos].fwd if strand == 0 else indexes[rpos].rc
            q = codes[qpos]
            fac_match = 0
            # factor-only matches: recompute per-factor match counts
            for (qs, qe, rs, re_) in factors:
                seg_q = q[qs:qe + 1]
                seg_r = rseq[rs:rs + (qe - qs + 1)]
                fac_match += int(((seg_q == seg_r) & (seg_q < 4)).sum())
            credit = {k: 0 for k in ('prev', 'next', 'split', 'either',
                                     'lcs', 'mismatch')}
            tot_gap = 0
            for fa, fb in zip(factors, factors[1:]):
                p_, n_, s_, e_, g_ = gap_credits(q, rseq, fa, fb)
                credit['prev'] += p_
                credit['next'] += n_
                credit['split'] += s_
                credit['either'] += e_
                if g_ > 0:
                    gq = q[fa[1] + 1:fb[0]]
                    gr = rseq[fa[3] + 1:fb[2]]
                    credit['lcs'] += lcs_matches(gq, gr)
                tot_gap += g_
            # back-extension contribution = a.nt_match - (fac + prev-credit)
            # under current policy 'prev'; isolate it:
            back = a.nt_match - fac_match - credit['prev']
            target = gm - fac_match - back   # golden gap credit (assuming
            #                                  same back-extension)
            fits = [k for k, v in credit.items() if v == target]
            if fits:
                verdicts['fits:' + '+'.join(sorted(fits))] += 1
            else:
                verdicts['no-fit'] += 1
                residuals[target - credit['either']] += 1
            if shown < int(sys.argv[2] if len(sys.argv) > 2 else 0):
                shown += 1
                print(f'{names[qpos]} vs {names[rpos]} q[{key[0]},{key[1]}] '
                      f'golden m={gm} mine={a.nt_match} fac={fac_match} '
                      f'back={back} gap={tot_gap} credits={credit} '
                      f'target={target} nfac={len(factors)}')
    print('\nverdicts:', dict(verdicts))
    print('residual (target - split) histogram:',
          dict(sorted(residuals.items())))


if __name__ == '__main__':
    main()
