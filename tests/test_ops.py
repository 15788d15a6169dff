"""Tests for the JAX compute ops (run on CPU with a virtual device mesh)."""

import sys

import numpy as np

sys.path.insert(0, '.')

from vclust_tpu.ops.prefilter import (shared_kmer_counts_host,
                                      shared_kmer_counts_device, ani_shorter)


def _random_sets(rng, n, lo=50, hi=500):
    sets = []
    for _ in range(n):
        size = int(rng.integers(lo, hi))
        sets.append(np.unique(rng.integers(0, 10_000, size).astype(
            np.uint64)))
    return sets


def test_occupancy_matmul_matches_host():
    rng = np.random.default_rng(42)
    sets = _random_sets(rng, 12)
    host = shared_kmer_counts_host(sets)
    dev = shared_kmer_counts_device(sets)
    assert np.array_equal(host, dev)


def test_occupancy_matmul_chunked():
    rng = np.random.default_rng(1)
    sets = _random_sets(rng, 5, 500, 2000)
    host = shared_kmer_counts_host(sets)
    dev = shared_kmer_counts_device(sets, rows_chunk=256)   # many chunks
    assert np.array_equal(host, dev)


def test_ani_shorter_formula():
    # c=1 (identical sets) -> ani_shorter = 1.
    counts = np.array([[10, 10], [10, 10]])
    sizes = np.array([10, 10])
    s = ani_shorter(counts, sizes, 25)
    assert s[0, 1] == 1.0
    # Golden spot value (SURVEY.md section 2.4.5): containment from the
    # example pair NC_010807.alt1 vs NC_010807 reproduces 0.998480.
    # c = 2c/(1+c) inverse-checked through the formula with k=25.
    c = 0.927887  # solves 1 + ln(2c/(1+c))/25 = 0.99848 approximately
    shared = int(round(c * 1_000_000))
    s = ani_shorter(np.array([[1_000_000, shared], [shared, 1_000_000]]),
                    np.array([1_000_000, 1_200_000]), 25)
    assert abs(s[0, 1] - 0.99848) < 1e-4


def test_zero_overlap_filtered():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([4, 5, 6], dtype=np.uint64)
    counts = shared_kmer_counts_host([a, b])
    s = ani_shorter(counts, np.array([3, 3]), 25)
    assert counts[0, 1] == 0
    assert s[0, 1] == -np.inf


def test_connected_components_device_matches_union_find():
    from vclust_tpu.ops.cc import connected_components_device
    rng = np.random.default_rng(3)
    n = 500
    edges = rng.integers(0, n, (300, 2)).astype(np.int32)
    labels = connected_components_device(n, edges)
    # Host union-find reference.
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = np.array([find(i) for i in range(n)])
    assert np.array_equal(labels, expect)


def test_connected_components_empty():
    from vclust_tpu.ops.cc import connected_components_device
    assert connected_components_device(0, np.empty((0, 2))).tolist() == []
    assert connected_components_device(
        3, np.empty((0, 2))).tolist() == [0, 1, 2]


def test_panel_counts_match_dense():
    """Row-panel streaming counts == dense device counts == host counts."""
    import numpy as np
    from vclust_tpu.ops.prefilter import (
        shared_kmer_counts_host, shared_kmer_counts_panels)

    rng = np.random.default_rng(11)
    sets = []
    universe = rng.choice(2**40, size=3000, replace=False).astype(np.uint64)
    for g in range(23):
        take = rng.random(len(universe)) < rng.uniform(0.05, 0.5)
        sets.append(np.sort(universe[take]))
    dense = shared_kmer_counts_host(sets)
    out = np.zeros_like(dense)
    for lo, hi, block in shared_kmer_counts_panels(
            sets, panel=7, rows_chunk=512, nnz_chunk=4096):
        out[lo:hi] = block
    assert np.array_equal(out, dense)


def test_pattern_dedup_counts_match_host():
    """Pattern-compressed weighted counts == host oracle on a corpus with
    heavy pattern duplication (small k-mer universe, clustered genomes)."""
    import numpy as np
    from vclust_tpu.ops.prefilter import (
        PrefilterIndex, shared_kmer_counts_host, shared_kmer_counts_indexed)

    rng = np.random.default_rng(5)
    universe = rng.choice(2**30, size=4000, replace=False).astype(np.uint64)
    sets = []
    for fam in range(6):                       # 6 families of 5 near-clones
        base = universe[rng.random(len(universe)) < 0.3]
        for _ in range(5):
            drop = rng.random(len(base)) < 0.05
            sets.append(np.sort(base[~drop]))
    host = shared_kmer_counts_host(sets)
    idx = PrefilterIndex(sets)
    assert idx.dedup_ratio > 2.0               # compression actually engaged
    assert np.array_equal(shared_kmer_counts_indexed(idx), host)


def test_native_index_matches_numpy_patterns():
    """The native C++ index build (native/kmerindex.cpp) produces the same
    pattern multiset (gid sequences, lengths, weights) and group count as
    the numpy pipeline for random corpora."""
    import numpy as np
    from vclust_tpu.ops.prefilter import PrefilterIndex
    from vclust_tpu.ops import kmer_native

    if not kmer_native.available():
        import pytest
        pytest.skip('native index engine unavailable')

    rng = np.random.default_rng(42)
    for _ in range(10):
        n = int(rng.integers(2, 12))
        sets = [np.unique(rng.integers(
            0, 300, int(rng.integers(0, 200))).astype(np.uint64))
            for _ in range(n)]
        a = PrefilterIndex(sets, engine='native')
        b = PrefilterIndex(sets, engine='numpy')
        assert a.n_groups == b.n_groups

        def canon(ix):
            out, off = [], 0
            for L, w in zip(ix.lens, ix.weights):
                out.append((tuple(ix.gids[off:off + L]), int(w)))
                off += L
            return sorted(out)
        assert canon(a) == canon(b)


def test_batch_store_blocks_match_dense(tmp_path):
    """Persisted-batch blockwise counting (the .kdb/all2all-parts analog)
    == dense host counts, including cross-batch blocks and uneven tail."""
    import numpy as np
    from vclust_tpu.ops.prefilter import (BatchIndexStore,
                                          shared_kmer_counts_host)

    rng = np.random.default_rng(5)
    universe = rng.choice(2**40, size=2000, replace=False).astype(np.uint64)
    sets = []
    for g in range(30):
        take = rng.random(len(universe)) < rng.uniform(0.1, 0.6)
        sets.append(np.sort(universe[take]))
    dense = shared_kmer_counts_host(sets)

    store = BatchIndexStore(tmp_path)
    for lo in range(0, 30, 7):
        store.add_batch(sets[lo:lo + 7], lo)
    out = np.zeros_like(dense)
    nb = len(store.batches)
    for i in range(nb):
        for j in range(i, nb):
            ro, co, block = store.pair_block(i, j)
            out[ro:ro + block.shape[0], co:co + block.shape[1]] = block
            if i != j:
                out[co:co + block.shape[1], ro:ro + block.shape[0]] = block.T
    assert np.array_equal(out, dense)
