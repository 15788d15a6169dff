"""Multi-device weak/strong-scaling harness (BASELINE.md: >=80% efficiency
at 2+ hosts).

Runs the two device stages — the prefilter occupancy matmul
(ops/prefilter.py) and the TPU align engine (ops/align_tpu.py) — over
1/2/4/8-device meshes and reports rates + parallel efficiency. On this
box the mesh is the virtual CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count=8), so wall-clock efficiency is
bounded by the physical core count; the numbers still validate that the
sharded path distributes work evenly and adds no superlinear overhead,
and the same code path rides ICI on a real pod.

Prints ONE JSON line; bench.py runs this as a subprocess and merges the
result into its detail dict.
"""

import json
import os
import sys
import time

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# The driver environment pins the TPU plugin via a sitecustomize hook that
# wins over JAX_PLATFORMS; re-pin through jax.config (as tests/conftest.py
# does) so the virtual 8-device CPU mesh actually materializes.
import jax
jax.config.update('jax_platforms', 'cpu')


def main():
    import jax
    from vclust_tpu.ops.prefilter import (PrefilterIndex,
                                          shared_kmer_counts_indexed)
    from vclust_tpu.ops import align_tpu
    from vclust_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    fan = [d for d in (1, 2, 4, 8) if d <= n_avail]

    # Prefilter corpus: 512 synthetic sketches over a shared universe.
    rng = np.random.default_rng(0)
    universe = np.unique(rng.integers(0, 2 ** 50, 400_000).astype(np.uint64))
    sets = [np.sort(np.unique(rng.choice(universe, 3000)))
            for _ in range(512)]
    index = PrefilterIndex(sets)
    n_pairs_pf = 512 * 511 // 2

    # Align corpus: 24 contigs, 3.5 kb, mixed divergence.
    base = rng.integers(0, 4, 3500).astype(np.int8)
    codes = []
    for _ in range(24):
        mut = base.copy()
        mask = rng.random(len(mut)) < rng.uniform(0.02, 0.08)
        mut[mask] = rng.integers(0, 4, mask.sum())
        codes.append(mut)
    pairs = np.array([(i, j) for i in range(24) for j in range(i + 1, 24)],
                     dtype=np.int32)
    aidx = align_tpu.GenomeIndexTPU(codes)

    out = {'devices_available': n_avail}
    pf_rate, al_rate = {}, {}
    for d in fan:
        mesh = make_mesh(d) if d > 1 else None
        # prefilter
        shared_kmer_counts_indexed(index, mesh=mesh, engine='device')
        t0 = time.time()
        shared_kmer_counts_indexed(index, mesh=mesh, engine='device')
        pf_rate[d] = n_pairs_pf / (time.time() - t0)
        # align
        align_tpu.all2all_tpu(codes, pairs, index=aidx, mesh=mesh)
        t0 = time.time()
        align_tpu.all2all_tpu(codes, pairs, index=aidx, mesh=mesh)
        al_rate[d] = len(pairs) / (time.time() - t0)

    for name, rate in (('prefilter', pf_rate), ('align', al_rate)):
        for d in fan:
            out[f'{name}_pairs_per_s_{d}dev'] = round(rate[d], 1)
            if d > 1:
                out[f'{name}_scaling_eff_{d}dev'] = round(
                    rate[d] / (d * rate[1]), 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
