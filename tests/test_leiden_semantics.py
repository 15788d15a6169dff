"""Semantic oracle for the Leiden implementation (ops/leiden.py).

The reference delegates Leiden to igraph inside clusty (vclust.py:549-569)
with no membership goldens; clusty CI asserts exit 0 only. These tests give
the from-scratch implementation an independent oracle against the CPM
objective (igraph community_leiden's objective; see ops/leiden.py):

- planted-partition recovery: dense known communities, sparse inter-
  community noise -> exact community recovery at a resolution below the
  intra-community density;
- CPM quality: the returned partition's quality must beat both the
  singleton partition and the one-cluster partition;
- resolution monotonicity: higher resolution can only split communities
  (weakly more clusters on a fixed graph);
- connectivity: every returned community is a connected subgraph — the
  property that distinguishes Leiden from Louvain (Traag et al. 2019).
"""

import numpy as np
import pytest

from vclust_tpu.ops.leiden import leiden


def _planted(rng, n_comm=4, size=12, p_in=0.9, p_out=0.05):
    n = n_comm * size
    truth = np.repeat(np.arange(n_comm), size)
    edges, weights = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if truth[i] == truth[j] else p_out
            if rng.random() < p:
                edges.append((i, j))
                weights.append(rng.uniform(0.8, 1.0)
                               if truth[i] == truth[j]
                               else rng.uniform(0.1, 0.3))
    return n, truth, np.array(edges), np.array(weights)


def cpm_quality(n, edges, weights, labels, resolution):
    """CPM: sum_C [W_in(C) - resolution * n_C (n_C - 1) / 2]."""
    labels = np.asarray(labels)
    intra = sum(w for (a, b), w in zip(edges, weights)
                if labels[a] == labels[b])
    sizes = np.bincount(labels)
    return intra - resolution * float((sizes * (sizes - 1)).sum()) / 2.0


def test_planted_partition_recovered():
    rng = np.random.default_rng(0)
    n, truth, edges, weights = _planted(rng)
    labels = np.asarray(leiden(n, edges, weights, resolution=0.5))
    # Same partition as the planted truth (up to label renaming).
    _, a = np.unique(labels, return_inverse=True)
    _, b = np.unique(truth, return_inverse=True)
    remap = {}
    for x, y in zip(a, b):
        assert remap.setdefault(x, y) == y, 'community split/merged'
    assert len(set(remap.values())) == len(remap)


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_cpm_quality_beats_trivial_partitions(seed):
    rng = np.random.default_rng(seed)
    n, _, edges, weights = _planted(rng, n_comm=3, size=10)
    res = 0.5
    labels = leiden(n, edges, weights, resolution=res)
    q = cpm_quality(n, edges, weights, labels, res)
    q_single = cpm_quality(n, edges, weights, np.zeros(n, dtype=int), res)
    q_singletons = cpm_quality(n, edges, weights, np.arange(n), res)
    assert q > q_single + 1e-9
    assert q > q_singletons + 1e-9


def test_resolution_monotone_cluster_count():
    rng = np.random.default_rng(4)
    n, _, edges, weights = _planted(rng, n_comm=4, size=8)
    counts = []
    for res in (0.01, 0.5, 0.95, 2.0):
        labels = leiden(n, edges, weights, resolution=res)
        counts.append(len(set(labels)))
    assert counts == sorted(counts), counts
    assert counts[0] < counts[-1]   # extremes genuinely differ


def test_communities_are_connected():
    """Leiden's defining guarantee vs Louvain: connected communities."""
    rng = np.random.default_rng(5)
    n, _, edges, weights = _planted(rng, n_comm=5, size=9, p_out=0.02)
    labels = np.asarray(leiden(n, edges, weights, resolution=0.5))
    adj = {i: set() for i in range(n)}
    for (a, b), w in zip(edges, weights):
        if labels[a] == labels[b]:
            adj[a].add(b)
            adj[b].add(a)
    for c in set(labels):
        members = np.flatnonzero(labels == c)
        seen = {int(members[0])}
        stack = [int(members[0])]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        assert seen == set(int(x) for x in members), (
            f'community {c} is disconnected')


def test_weighted_barbell_respects_weak_bridge():
    """Two cliques joined by one weak edge must not merge at a resolution
    above the bridge density; a near-zero resolution must merge all."""
    size = 8
    edges, weights = [], []
    for off in (0, size):
        for i in range(size):
            for j in range(i + 1, size):
                edges.append((off + i, off + j))
                weights.append(1.0)
    edges.append((0, size))
    weights.append(0.05)
    edges, weights = np.array(edges), np.array(weights)
    labels = np.asarray(leiden(2 * size, edges, weights, resolution=0.7))
    assert len(set(labels)) == 2
    assert len(set(labels[:size])) == 1 and len(set(labels[size:])) == 1
    merged = leiden(2 * size, edges, weights, resolution=1e-5)
    assert len(set(merged)) == 1


def test_leiden_matches_igraph_on_planted_partitions():
    """Cross-validation against igraph community_leiden at the reference's
    parameters (clusty builds igraph with LEIDEN=true, reference
    vclust.py:549-569: CPM objective, resolution 0.7, beta 0.01,
    2 iterations). igraph is not installable in this environment (no
    egress), so the test skips here and runs wherever igraph exists —
    on >= 5 planted-partition graphs both implementations must recover
    the planted communities exactly, hence agree with each other."""
    ig = pytest.importorskip('igraph')
    rng = np.random.default_rng(5)
    for trial in range(5):
        k = int(rng.integers(3, 6))
        sizes = rng.integers(5, 12, k)
        n = int(sizes.sum())
        starts = np.concatenate([[0], np.cumsum(sizes)])
        planted = np.concatenate([np.full(s, c) for c, s in
                                  enumerate(sizes)])
        edges, weights = [], []
        for c in range(k):
            lo, hi = starts[c], starts[c + 1]
            for i in range(lo, hi):
                for j in range(i + 1, hi):
                    edges.append((i, j))
                    weights.append(float(rng.uniform(0.96, 1.0)))
        # sparse weak inter-community edges below the CPM threshold
        for _ in range(n // 2):
            a, b = rng.integers(0, n, 2)
            if planted[a] != planted[b]:
                edges.append((int(min(a, b)), int(max(a, b))))
                weights.append(float(rng.uniform(0.0, 0.2)))
        edges = np.array(edges)
        weights = np.array(weights)
        mine = np.asarray(leiden(n, edges, weights, resolution=0.7,
                                 beta=0.01, iterations=2))
        g = ig.Graph(n=n, edges=[tuple(e) for e in edges])
        theirs = np.asarray(g.community_leiden(
            objective_function='CPM', weights=list(weights),
            resolution=0.7, beta=0.01, n_iterations=2).membership)

        def canon(lab):
            seen, out = {}, []
            for x in lab:
                out.append(seen.setdefault(x, len(seen)))
            return out

        assert canon(mine) == canon(planted)
        assert canon(theirs) == canon(planted)
