#!/usr/bin/env python
"""Iteration harness for the TPU aligner: accuracy vs the exact engine and
the simulated-truth tANI table, plus warm throughput on the real chip."""
import sys
import time

sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import (_genome_codes, order_objects, run_align)
from vclust_tpu.ops import align_tpu

TRUE_TANI = {
    ('NC_010807', 'NC_010807.alt1'): 0.99753,
    ('NC_010807', 'NC_010807.alt2'): 0.98985,
    ('NC_010807', 'NC_010807.alt3'): 0.98414,
    ('NC_005091', 'NC_005091.alt1'): 0.97161,
    ('NC_005091', 'NC_005091.alt2'): 0.96707,
    ('NC_025457', 'NC_025457.alt1'): 0.80607,
    ('NC_025457', 'NC_025457.alt2'): 0.75921,
    ('NC_002486', 'NC_002486.alt'): 1.00000,
}


def main():
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    order = order_objects(genomes)
    names = [genomes[i].name for i in order]
    lengths = [genomes[i].total_len for i in order]
    codes = [_genome_codes(genomes[i]) for i in order]
    n = len(genomes)
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     dtype=np.int32)

    # Exact engine (oracle)
    exact = run_align(genomes, keep_alignments=False)
    ex = {}
    for r in exact.rows:
        ex[(r.qidx, r.ridx)] = r

    t0 = time.time()
    idx = align_tpu.GenomeIndexTPU(codes)
    t_idx = time.time() - t0
    t0 = time.time()
    agg = align_tpu.all2all_tpu(codes, pairs, index=idx)
    t_first = time.time() - t0
    t0 = time.time()
    agg = align_tpu.all2all_tpu(codes, pairs, index=idx)
    t_warm = time.time() - t0
    print(f'index {t_idx:.2f}s  first {t_first:.2f}s  warm {t_warm:.3f}s '
          f'({2 * len(pairs) / t_warm:.1f} directed pairs/s warm)')

    print(f'{"pair":42s} {"tani_tpu":>9s} {"tani_ex":>9s} {"dtani":>8s} '
          f'{"dqcov":>8s} {"dn":>4s}')
    worst = 0.0
    for row, (i, j) in enumerate(pairs):
        n_ji, m_ji, l_ji, n_ij, m_ij, l_ij = agg[row]
        qlen_j, qlen_i = lengths[j], lengths[i]
        tani = (m_ji + m_ij) / (qlen_i + qlen_j)
        r = ex.get((j, i))
        tani_ex = r.tani if r else 0.0
        qcov = l_ji / qlen_j
        qcov_ex = r.qcov if r else 0.0
        nx = r.num_alns if r else 0
        d = abs(tani - tani_ex)
        worst = max(worst, d)
        if d > 0.002 or abs(qcov - qcov_ex) > 0.01:
            print(f'{names[i][:20]:21s}{names[j][:20]:21s} {tani:9.5f} '
                  f'{tani_ex:9.5f} {d:8.5f} {qcov - qcov_ex:8.4f} '
                  f'{int(n_ji) - nx:4d}')
    print(f'worst |tani_tpu - tani_exact| over all pairs: {worst:.5f}')

    print('\ntruth table:')
    name_pos = {nm: p for p, nm in enumerate(names)}
    bad = 0
    for (a, b), truth in TRUE_TANI.items():
        ia, ib = name_pos[a], name_pos[b]
        i, j = min(ia, ib), max(ia, ib)
        row = next(r for r, (pi, pj) in enumerate(pairs)
                   if (pi, pj) == (i, j))
        n_ji, m_ji, l_ji, n_ij, m_ij, l_ij = agg[row]
        tani = (m_ji + m_ij) / (lengths[i] + lengths[j])
        err = tani - truth
        flag = ' OK' if abs(err) <= 0.007 else ' **FAIL**'
        bad += abs(err) > 0.007
        print(f'{a:12s} {b:18s} truth {truth:.5f} tpu {tani:.5f} '
              f'err {err:+.5f}{flag}')
    print(f'{bad} truth failures')


if __name__ == '__main__':
    main()
