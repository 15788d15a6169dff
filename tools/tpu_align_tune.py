#!/usr/bin/env python
"""Knob-tuning harness for the TPU aligner's accuracy-critical pairs.

Runs the truth pairs (reference test.py:456-477 contract, truth table
example/README.txt) plus the junk-pair guard under the current module
constants, printing per-pair tANI deltas vs the exact engine and vs
simulated truth. Patch constants via env (VCLUST_TUNE_*) to experiment:

  VCLUST_TUNE_STRIDE=1 VCLUST_TUNE_MIN_VOTES_F=2 python tools/tpu_align_tune.py
"""
import os
import sys

sys.path.insert(0, '.')

import numpy as np

from vclust_tpu.ops import align_tpu

for name in ('STRIDE', 'MIN_VOTES_F', 'MIN_VOTES_C', 'GAP_DIAG', 'FINE',
             'SEED_K', 'K_QUERIES'):
    v = os.environ.get(f'VCLUST_TUNE_{name}')
    if v is not None:
        setattr(align_tpu, name, int(v))
        print(f'# {name} = {v}')

from vclust_tpu.models.input import load_genomes
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import run_align

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
    import time
    t0 = time.time()
    tpu = {(r.query, r.reference): r
           for r in run_align(genomes, engine='tpu').rows}
    dt = time.time() - t0
    exact = {(r.query, r.reference): r for r in run_align(genomes).rows}
    worst = 0.0
    for pair, truth in TRUE_TANI.items():
        row = tpu.get(pair) or tpu.get((pair[1], pair[0]))
        t = row.tani if row else 0.0
        print(f'{pair[1]:20s} truth {truth:.5f} tpu {t:.5f} '
              f'd_truth {t - truth:+.5f}')
        worst = max(worst, abs(t - truth))
    inflate = 0.0
    drift = 0.0
    for key, ex in exact.items():
        row = tpu.get(key)
        if ex.tani >= 0.5 and row is not None:
            drift = max(drift, abs(row.tani - ex.tani))
        elif row is not None:
            inflate = max(inflate, row.tani - ex.tani)
    print(f'# worst |d_truth| {worst:.5f}  max drift vs exact {drift:.5f}  '
          f'max junk inflation {inflate:.5f}  tpu_seconds {dt:.1f}')


if __name__ == '__main__':
    main()
