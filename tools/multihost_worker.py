"""Worker process for tests/test_multihost.py: one of N processes in a
jax.distributed CPU run (4 virtual devices each), executing the REAL
sharded pipeline ops over the global mesh and asserting bit-equality with
the single-process oracles.

Spawned with env: VCLUST_DIST_COORD/NPROCS/PROCID (the production env
contract of vclust_tpu.parallel.distributed) + JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=4.
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vclust_tpu.parallel.distributed import (  # noqa: E402
    maybe_initialize, global_mesh, process_info)


def main():
    assert maybe_initialize(), 'distributed env vars missing'
    info = process_info()
    assert info is not None, 'expected multi-process run'
    pid, nprocs = info
    assert jax.process_count() == nprocs
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nprocs * n_local, (n_global, nprocs, n_local)
    mesh = global_mesh()

    # --- real prefilter path: mesh-sharded weighted occupancy matmul ----
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.prefilter import genome_kmer_set
    from vclust_tpu.ops.prefilter import (PrefilterIndex,
                                          shared_kmer_counts_host,
                                          shared_kmer_counts_indexed)
    from vclust_tpu.utils.data import example_path

    genomes, _ = load_genomes(example_path('multifasta.fna'))
    sets = [genome_kmer_set(g, 25, 1.0) for g in genomes]
    counts = shared_kmer_counts_indexed(PrefilterIndex(sets), mesh=mesh,
                                        engine='device')
    expect = shared_kmer_counts_host(sets)
    np.testing.assert_array_equal(counts, expect)

    # --- real align path: pair-chunk axis sharded over the global mesh --
    from vclust_tpu.ops import align_tpu
    rng = np.random.default_rng(0)
    base = rng.integers(0, 4, 3500).astype(np.int8)
    codes = []
    for _ in range(6):
        mut = base.copy()
        mask = rng.random(len(mut)) < 0.03
        mut[mask] = rng.integers(0, 4, mask.sum())
        codes.append(mut)
    pairs = np.array([(i, j) for i in range(6) for j in range(i + 1, 6)],
                     dtype=np.int32)
    sharded = align_tpu.all2all_tpu(codes, pairs, mesh=mesh)
    single = align_tpu.all2all_tpu(codes, pairs)   # local single-device
    np.testing.assert_array_equal(sharded, single)

    print(f'MULTIHOST_OK pid={pid}/{nprocs} devices={n_global}', flush=True)


if __name__ == '__main__':
    main()
