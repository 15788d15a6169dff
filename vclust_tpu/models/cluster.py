"""Cluster stage: graph clustering of the sparse ANI similarity matrix.

Replaces clusty (reference contract vclust.py:1184-1278; SURVEY.md section
2.6). Input: an ani.tsv-like table (directed rows qidx/ridx + measure
columns) and the objects (ids) table; output: per-object cluster labels in
objects order.

Semantics pinned by the reference:
- edge pre-filters: --min on any column (and --max for num_alns); the
  clustering threshold itself arrives as a min-filter on the metric column
  (reference vclust.py:1260-1266);
- objects file is sorted by length descending, so "longest-first" greedy
  algorithms process objects in index order;
- cluster ids (golden example/output/clusters.tsv): multi-member clusters
  are numbered first, in order of their smallest member index, then
  singletons in objects order;
- --out-representatives: label = name of the longest member (= smallest
  index, since objects are length-sorted).

Six algorithms: single, complete, uclust, cd-hit, set-cover, leiden.
For very large graphs the single-linkage path can run on TPU via
ops.connected_components (iterative min-label propagation); the host
union-find is the exact/deterministic default.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

ALGORITHMS = ('single', 'complete', 'uclust', 'cd-hit', 'set-cover', 'leiden')

# Columns where the pre-filter is a maximum (reference vclust.py:529-537).
MAX_FILTER_COLUMNS = ('num_alns',)


@dataclass
class ClusterParams:
    algorithm: str = 'single'
    metric: str = 'tani'
    metric_threshold: float = 0.0
    min_filters: Dict[str, float] = field(default_factory=dict)
    max_filters: Dict[str, float] = field(default_factory=dict)
    out_representatives: bool = False
    leiden_resolution: float = 0.7
    leiden_beta: float = 0.01
    leiden_iterations: int = 2


def build_edges(header: Sequence[str], rows, params: ClusterParams,
                n_objects: int):
    """Filter directed rows -> symmetric edge list with metric weights.

    Returns (edges, weights): unique undirected pairs (i, j) with i < j and
    the maximum passing metric value over the two directed rows.
    """
    col = {name: k for k, name in enumerate(header)}
    qi, ri = col['qidx'], col['ridx']
    mi = col[params.metric]
    checks = []
    for name, v in params.min_filters.items():
        if v:
            checks.append((col[name], v, True))
    for name, v in params.max_filters.items():
        if v:
            checks.append((col[name], v, False))
    best: Dict[Tuple[int, int], float] = {}
    for row in rows:
        value = float(row[mi])
        if value < params.metric_threshold:
            continue
        ok = True
        for k, v, is_min in checks:
            x = float(row[k])
            if (x < v) if is_min else (x > v):
                ok = False
                break
        if not ok:
            continue
        a, b = int(row[qi]), int(row[ri])
        if a == b or a >= n_objects or b >= n_objects:
            continue
        key = (a, b) if a < b else (b, a)
        prev = best.get(key)
        if prev is None or value > prev:
            best[key] = value
    if not best:
        return (np.empty((0, 2), dtype=np.int64),
                np.empty(0, dtype=np.float64))
    pairs = np.array(sorted(best), dtype=np.int64)
    weights = np.array([best[tuple(p)] for p in pairs], dtype=np.float64)
    return pairs, weights


def _adjacency(n: int, edges: np.ndarray, weights: np.ndarray):
    adj: List[Dict[int, float]] = [dict() for _ in range(n)]
    for (a, b), w in zip(edges, weights):
        adj[a][b] = w
        adj[b][a] = w
    return adj


# ---------------------------------------------------------------------------
# Algorithms: each returns a raw member->group mapping (any int labels).
# ---------------------------------------------------------------------------

def _single(n, edges, weights, adj, params):
    # Large graphs: TPU min-label propagation (identical labels: the
    # union-find below also converges to min member index).
    if n >= 50_000 and len(edges):
        try:
            from ..ops.cc import connected_components_device
            return connected_components_device(n, edges).tolist()
        except Exception:
            pass
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [find(i) for i in range(n)]


def _complete(n, edges, weights, adj, params):
    # Greedy longest-first: an object joins the first existing cluster it is
    # connected to every member of; otherwise it founds a new cluster.
    clusters: List[List[int]] = []
    labels = [0] * n
    for i in range(n):
        placed = False
        for ci, members in enumerate(clusters):
            if all(i in adj[m] for m in members):
                members.append(i)
                labels[i] = ci
                placed = True
                break
        if not placed:
            labels[i] = len(clusters)
            clusters.append([i])
    return labels


def _uclust(n, edges, weights, adj, params):
    # Longest-first greedy: assign to the best-scoring centroid, else found.
    centroids: List[int] = []
    labels = [0] * n
    for i in range(n):
        best = None
        for c in centroids:
            w = adj[i].get(c)
            if w is not None and (best is None or w > best[0]):
                best = (w, c)
        if best is not None:
            labels[i] = best[1]
        else:
            labels[i] = i
            centroids.append(i)
    return labels


def _cdhit(n, edges, weights, adj, params):
    # Longest-first greedy: assign to the first centroid that passes.
    centroids: List[int] = []
    labels = [0] * n
    for i in range(n):
        for c in centroids:
            if c in adj[i]:
                labels[i] = c
                break
        else:
            labels[i] = i
            centroids.append(i)
    return labels


def _set_cover(n, edges, weights, adj, params):
    # MMseqs2-style: repeatedly pick the node covering the most uncovered
    # neighbors (ties -> smallest index); it founds a cluster of itself plus
    # its uncovered neighbors.
    labels = [-1] * n
    uncovered = set(range(n))
    while uncovered:
        best_node, best_gain = -1, -1
        for i in sorted(uncovered):
            gain = sum(1 for j in adj[i] if j in uncovered)
            if gain > best_gain:
                best_node, best_gain = i, gain
        members = [best_node] + sorted(
            j for j in adj[best_node] if j in uncovered and j != best_node)
        for m in members:
            labels[m] = best_node
            uncovered.discard(m)
    return labels


def _leiden(n, edges, weights, adj, params):
    from ..ops.leiden import leiden
    return leiden(n, edges, weights,
                  resolution=params.leiden_resolution,
                  beta=params.leiden_beta,
                  iterations=params.leiden_iterations)


_ALGOS = {
    'single': _single,
    'complete': _complete,
    'uclust': _uclust,
    'cd-hit': _cdhit,
    'set-cover': _set_cover,
    'leiden': _leiden,
}


def _renumber(raw: List[int]) -> List[int]:
    """Apply the reference's id scheme: multi-member clusters first (ordered
    by smallest member index), then singletons in objects order."""
    groups: Dict[int, List[int]] = {}
    for i, g in enumerate(raw):
        groups.setdefault(g, []).append(i)
    multi = sorted((min(m) for m in groups.values() if len(m) > 1))
    singles = sorted(min(m) for m in groups.values() if len(m) == 1)
    order = {}
    next_id = 0
    for first in multi:
        order[raw[first]] = next_id
        next_id += 1
    for first in singles:
        order[raw[first]] = next_id
        next_id += 1
    return [order[g] for g in raw]


def run_cluster(
    header: Sequence[str],
    rows,
    objects: Sequence[Tuple[str, int, int]],
    params: ClusterParams,
):
    """Cluster objects; returns labels column for clusters.tsv (ints, or
    representative names with out_representatives)."""
    n = len(objects)
    edges, weights = build_edges(header, rows, params, n)
    adj = _adjacency(n, edges, weights)
    raw = _ALGOS[params.algorithm](n, edges, weights, adj, params)
    ids = _renumber(raw)
    if not params.out_representatives:
        return ids
    groups: Dict[int, int] = {}
    for i, g in enumerate(ids):
        if g not in groups:
            groups[g] = i   # smallest index = longest member
    return [objects[groups[g]][0] for g in ids]
