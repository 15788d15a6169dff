"""Scalability smoke for the clustering algorithms (BASELINE.md names
million-contig vOTU configs; CI keeps it to 100k nodes / ~300k edges and
asserts seconds-scale wall time so O(n^2) regressions fail loudly)."""

import time

import numpy as np
import pytest

from vclust_tpu.models.cluster import _CSR, _ALGOS, ClusterParams


@pytest.fixture(scope='module')
def big_graph():
    rng = np.random.default_rng(0)
    n = 100_000
    # Clustered topology: 20k hubs each wired to a handful of followers,
    # plus random long-range edges.
    hubs = rng.integers(0, n // 5, 250_000)
    spokes = rng.integers(0, n, 250_000)
    extra = rng.integers(0, n, (50_000, 2))
    edges = np.concatenate(
        [np.stack([hubs, spokes], 1), extra]).astype(np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    edges = np.unique(np.sort(edges, axis=1), axis=0)
    weights = rng.uniform(0.9, 1.0, len(edges))
    return len(edges), edges, weights, _CSR(n, edges, weights)


@pytest.mark.parametrize('algorithm',
                         ['single', 'complete', 'uclust', 'cd-hit',
                          'set-cover', 'leiden'])
def test_algorithms_scale(big_graph, algorithm):
    n_edges, edges, weights, adj = big_graph
    n = adj.n
    params = ClusterParams(algorithm=algorithm)
    t0 = time.time()
    labels = _ALGOS[algorithm](n, edges, weights, adj, params)
    dt = time.time() - t0
    assert len(labels) == n
    assert dt < 120, f'{algorithm} took {dt:.1f}s on {n} nodes'
    # sanity: connected hub pairs land together under single linkage
    if algorithm == 'single':
        a, b = edges[0]
        assert labels[a] == labels[b]
