#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Round-1 headline: prefilter throughput on real TPU — genome pairs whose
exact shared-k-mer counts are produced per second by the blocked occupancy
matmul (the kmer-db all2all replacement). The corpus is the bundled
12-genome example replicated to a few hundred genomes, k-mer sets built
host-side (excluded from the timed region, matching how kmer-db's `build`
and `all2all` stages are timed separately in CI, large.yml:77-83).

vs_baseline compares against the BASELINE.json north-star rate of 1e6
genome-pair operations/s/chip.
"""

import json
import sys
import time

sys.path.insert(0, '.')


def main():
    import numpy as np
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.prefilter import genome_kmer_set
    from vclust_tpu.ops.prefilter import shared_kmer_counts_device

    genomes, _ = load_genomes('/root/reference/example/multifasta.fna')
    base_sets = [genome_kmer_set(g, 25, 1.0) for g in genomes]

    # Replicate with distinct hash offsets so the universe stays realistic.
    REP = 32
    sets = []
    for r in range(REP):
        off = np.uint64(r * 1_000_003)
        for s in base_sets:
            sets.append((s + off) if r else s)
    n = len(sets)
    n_pairs = n * (n - 1) // 2

    # Warm-up (compile), then timed runs.
    shared_kmer_counts_device(sets)
    times = []
    for _ in range(3):
        t0 = time.time()
        counts = shared_kmer_counts_device(sets)
        times.append(time.time() - t0)
    dt = min(times)
    pairs_per_s = n_pairs / dt

    print(json.dumps({
        'metric': 'prefilter_pairs_per_s',
        'value': round(pairs_per_s, 1),
        'unit': 'genome pairs/s (exact shared-25-mer counts, 1 chip)',
        'vs_baseline': round(pairs_per_s / 1e6, 4),
        'detail': {'n_genomes': n, 'n_pairs': n_pairs,
                   'seconds': round(dt, 4)},
    }))


if __name__ == '__main__':
    main()
