"""Device-mesh sharding of the real pipeline (virtual 8-device CPU mesh;
conftest forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8).

Pins: (a) the mesh-sharded prefilter counts equal the host sort-merge
counts bit-for-bit, (b) the mesh-sharded TPU align engine returns the same
aggregates as the single-device run, (c) run_prefilter end-to-end under a
mesh matches the host backend entries.
"""

import numpy as np
import pytest

jax = pytest.importorskip('jax')


def _mesh():
    from vclust_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip('needs a multi-device (virtual CPU) mesh')
    return make_mesh()


def _random_sets(n, rng):
    return [np.unique(rng.integers(0, 200_000, rng.integers(200, 800))
                      .astype(np.uint64)) for _ in range(n)]


def test_sharded_prefilter_counts_match_host():
    from vclust_tpu.ops.prefilter import (PrefilterIndex,
                                          shared_kmer_counts_host,
                                          shared_kmer_counts_indexed)
    mesh = _mesh()
    rng = np.random.default_rng(0)
    sets = _random_sets(37, rng)    # deliberately not divisible by 8
    expect = shared_kmer_counts_host(sets)
    got = shared_kmer_counts_indexed(PrefilterIndex(sets), mesh=mesh)
    np.testing.assert_array_equal(got, expect)


def test_run_prefilter_under_mesh_matches_host():
    from vclust_tpu.models.input import Genome
    from vclust_tpu.models.prefilter import run_prefilter
    rng = np.random.default_rng(1)
    acgt = np.frombuffer(b'ACGT', dtype='S1')
    base = [acgt[rng.integers(0, 4, 3000)].tobytes().decode()
            for _ in range(20)]
    genomes = []
    for i, s in enumerate(base):
        genomes.append(Genome(name=f'g{i}', seqs=[s.encode()]))
        mut = np.frombuffer(s.encode(), dtype='S1').copy()
        mask = rng.random(len(mut)) < 0.02
        mut[mask] = acgt[rng.integers(0, 4, mask.sum())]
        genomes.append(Genome(name=f'g{i}m', seqs=[mut.tobytes()]))
    a = run_prefilter(genomes, k=15, backend='device')
    b = run_prefilter(genomes, k=15, backend='host')
    assert a.entries.keys() == b.entries.keys()
    for key, v in a.entries.items():
        assert abs(v - b.entries[key]) < 1e-12


def test_batched_prefilter_under_mesh_matches_host():
    """Out-of-core (--batch-size) and the device mesh compose: the batch
    store's per-block counts run mesh-sharded and match the host engine
    (reference analog: all2all-parts over parts, vclust.py:1404-1462)."""
    from vclust_tpu.ops.prefilter import (BatchIndexStore,
                                          shared_kmer_counts_host)
    mesh = _mesh()
    rng = np.random.default_rng(5)
    sets = _random_sets(23, rng)    # 3 batches of <= 10, odd tail
    expect = shared_kmer_counts_host(sets)
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        store = BatchIndexStore(tmp)
        for lo in range(0, 23, 10):
            store.add_batch(sets[lo:lo + 10], lo)
        got = np.zeros_like(expect)
        nb = len(store.batches)
        for i in range(nb):
            for j in range(i, nb):
                ro, co, blk = store.pair_block(i, j, mesh=mesh)
                got[ro:ro + blk.shape[0], co:co + blk.shape[1]] = blk
                if i != j:
                    got[co:co + blk.shape[1], ro:ro + blk.shape[0]] = blk.T
    np.testing.assert_array_equal(got, expect)


def test_run_prefilter_batched_under_mesh_matches_host():
    """run_prefilter(batch_size=..) under the mesh == host backend."""
    from vclust_tpu.models.input import Genome
    from vclust_tpu.models.prefilter import run_prefilter
    rng = np.random.default_rng(6)
    acgt = np.frombuffer(b'ACGT', dtype='S1')
    genomes = []
    for i in range(12):
        s = acgt[rng.integers(0, 4, 2500)]
        genomes.append(Genome(name=f'g{i}', seqs=[s.tobytes()]))
        mut = s.copy()
        mask = rng.random(len(mut)) < 0.02
        mut[mask] = acgt[rng.integers(0, 4, mask.sum())]
        genomes.append(Genome(name=f'g{i}m', seqs=[mut.tobytes()]))
    a = run_prefilter(genomes, k=15, backend='device', batch_size=7)
    b = run_prefilter(genomes, k=15, backend='host')
    assert a.entries.keys() == b.entries.keys()
    for key, v in a.entries.items():
        assert abs(v - b.entries[key]) < 1e-12


def test_sharded_align_matches_single_device():
    from vclust_tpu.ops import align_tpu
    mesh = _mesh()
    rng = np.random.default_rng(2)
    codes = []
    base = rng.integers(0, 4, 3500).astype(np.int8)
    for _ in range(6):
        mut = base.copy()
        mask = rng.random(len(mut)) < 0.03
        mut[mask] = rng.integers(0, 4, mask.sum())
        codes.append(mut)
    pairs = np.array([(i, j) for i in range(6) for j in range(i + 1, 6)],
                     dtype=np.int32)
    single = align_tpu.all2all_tpu(codes, pairs)
    sharded = align_tpu.all2all_tpu(codes, pairs, mesh=mesh)
    np.testing.assert_array_equal(single, sharded)
    assert (single[:, 1] > 3000).all()   # near-identical mutants match


def test_sharded_align_subarena_matches_unbounded():
    """VCLUST_ALIGN_MAX_ARENA composes with the mesh path: a genome cap
    smaller than the corpus splits groups onto disposable exact-member
    sub-arenas, bounding per-device HBM, and must return bit-identical
    aggregates (BASELINE.json million-contig configs; README
    known-limitations)."""
    from vclust_tpu.ops import align_tpu
    mesh = _mesh()
    rng = np.random.default_rng(4)
    bases = [rng.integers(0, 4, 3000).astype(np.int8) for _ in range(3)]
    codes = []
    for i in range(12):
        mut = bases[i % 3].copy()
        mask = rng.random(len(mut)) < 0.05
        mut[mask] = rng.integers(0, 4, mask.sum())
        codes.append(mut)
    pairs = np.array([(i, j) for i in range(12) for j in range(i + 1, 12)],
                     dtype=np.int32)
    full = align_tpu.all2all_tpu(codes, pairs, mesh=mesh)
    old = align_tpu.MAX_ARENA
    align_tpu.MAX_ARENA = 5
    try:
        capped = align_tpu.all2all_tpu(codes, pairs, mesh=mesh)
    finally:
        align_tpu.MAX_ARENA = old
    np.testing.assert_array_equal(full, capped)
