"""Leiden community detection (host implementation).

Replaces clusty's igraph-backed Leiden mode (reference vclust.py:549-569;
flags --leiden-resolution/--leiden-beta/--leiden-iterations). Standard Leiden
(Traag et al. 2019): local moving, refinement with beta-randomness, graph
aggregation; modularity objective with a resolution parameter; weighted
undirected graphs. Deterministically seeded so repeated runs are
md5-stable, matching the reference's determinism contract
(SURVEY.md section 4.3).
"""

from typing import List

import numpy as np


def _local_move(n, neighbors, self_loops, comm, resolution, total_w, rng,
                node_w):
    """Queue-based local moving; mutates comm. Returns True if changed."""
    comm_w = np.zeros(n)
    for i in range(n):
        comm_w[comm[i]] += node_w[i]
    queue = list(range(n))
    in_queue = [True] * n
    changed = False
    head = 0
    while head < len(queue):
        i = queue[head]
        head += 1
        in_queue[i] = False
        ci = comm[i]
        # Weights from i to each neighboring community.
        w_to = {}
        for j, w in neighbors[i]:
            w_to[comm[j]] = w_to.get(comm[j], 0.0) + w
        comm_w[ci] -= node_w[i]
        best_c, best_gain = ci, w_to.get(ci, 0.0) - resolution * \
            node_w[i] * comm_w[ci] / (2.0 * total_w)
        for c, w in sorted(w_to.items()):
            if c == ci:
                continue
            gain = w - resolution * node_w[i] * comm_w[c] / (2.0 * total_w)
            if gain > best_gain + 1e-12:
                best_c, best_gain = c, gain
        comm_w[best_c] += node_w[i]
        if best_c != ci:
            comm[i] = best_c
            changed = True
            for j, _ in neighbors[i]:
                if comm[j] != best_c and not in_queue[j]:
                    queue.append(j)
                    in_queue[j] = True
    return changed


def _refine(n, neighbors, comm, resolution, total_w, beta, rng, node_w):
    """Refinement phase: within each community, grow well-connected
    subcommunities starting from singletons; beta controls randomness."""
    sub = np.arange(n)
    sub_w = node_w.copy().astype(float)
    order = rng.permutation(n)
    for i in order:
        if sub_w[sub[i]] != node_w[i]:
            continue  # only singleton subcommunities may move
        gains = []
        w_to = {}
        for j, w in neighbors[i]:
            if comm[j] != comm[i]:
                continue
            w_to[sub[j]] = w_to.get(sub[j], 0.0) + w
        for s, w in sorted(w_to.items()):
            if s == sub[i]:
                continue
            gain = w - resolution * node_w[i] * sub_w[s] / (2.0 * total_w)
            if gain >= 0:
                gains.append((gain, s))
        if not gains:
            continue
        if beta > 0:
            g = np.array([x[0] for x in gains])
            probs = np.exp(g / max(beta, 1e-9))
            probs /= probs.sum()
            pick = int(rng.choice(len(gains), p=probs))
        else:
            pick = int(np.argmax([x[0] for x in gains]))
        target = gains[pick][1]
        sub_w[target] += node_w[i]
        sub_w[sub[i]] -= node_w[i]
        sub[i] = target
    return sub


def leiden(n: int, edges: np.ndarray, weights: np.ndarray,
           resolution: float = 0.7, beta: float = 0.01,
           iterations: int = 2, seed: int = 0) -> List[int]:
    """Cluster a weighted undirected graph; returns a label per node."""
    if n == 0:
        return []
    rng = np.random.default_rng(seed)
    # Current aggregation state: mapping original node -> supernode.
    mapping = np.arange(n)
    cur_edges = [(int(a), int(b), float(w))
                 for (a, b), w in zip(edges, weights)]
    cur_n = n
    cur_node_w = np.ones(cur_n)

    for _ in range(max(1, iterations)):
        neighbors = [[] for _ in range(cur_n)]
        self_loops = np.zeros(cur_n)
        total_w = 0.0
        for a, b, w in cur_edges:
            if a == b:
                self_loops[a] += w
                total_w += w
                continue
            neighbors[a].append((b, w))
            neighbors[b].append((a, w))
            total_w += w
        if total_w <= 0:
            break
        comm = np.arange(cur_n)
        while _local_move(cur_n, neighbors, self_loops, comm, resolution,
                          total_w, rng, cur_node_w):
            pass
        sub = _refine(cur_n, neighbors, comm, resolution, total_w, beta,
                      rng, cur_node_w)
        # Aggregate by refined partition; communities constrain next round.
        uniq, sub_ids = np.unique(sub, return_inverse=True)
        new_n = len(uniq)
        agg = {}
        for a, b, w in cur_edges:
            sa, sb = sub_ids[a], sub_ids[b]
            key = (min(sa, sb), max(sa, sb))
            agg[key] = agg.get(key, 0.0) + w
        new_node_w = np.zeros(new_n)
        for i in range(cur_n):
            new_node_w[sub_ids[i]] += cur_node_w[i]
        # Compose mappings: original -> new supernode.
        mapping = sub_ids[mapping]
        cur_edges = [(a, b, w) for (a, b), w in agg.items()]
        if new_n == cur_n:
            cur_n = new_n
            cur_node_w = new_node_w
            break
        cur_n = new_n
        cur_node_w = new_node_w
    return [int(x) for x in mapping]
