"""Membership-level contracts of the greedy clustering algorithms.

The reference's own tests only smoke-test these (exit 0 + nonempty,
reference test.py:591-625) and the clusty C++ sources are absent
submodules, so the exact greedy orders are inferred (SURVEY.md sections
2.6.2, 7.3). These tests PIN the inferred semantics as this project's
contract on adversarial little graphs — ties, order dependence, chains —
so any reimplementation (or scalability rewrite) must preserve behavior:

- all greedy algorithms process objects longest-first (= index order;
  the ids table is length-sorted, SURVEY.md section 2.5.3);
- complete: join the earliest-founded cluster fully connected to you;
- uclust:   join the best-scoring centroid, ties -> earliest centroid;
- cd-hit:   join the earliest-founded centroid you touch at all;
- set-cover: repeatedly pick the node covering the most uncovered nodes,
  ties -> smallest index; the pick claims itself + uncovered neighbors.
"""

import pytest

from vclust_tpu.models.cluster import ClusterParams, run_cluster

HEADER = ['qidx', 'ridx', 'tani']


def cluster(n, edges, algorithm, threshold=0.5):
    """edges: [(a, b, w)] undirected; returns raw label list."""
    rows = []
    for a, b, w in edges:
        rows.append([a, b, w])
        rows.append([b, a, w])
    objects = [(f'g{i}', 1000 - i, 1) for i in range(n)]
    params = ClusterParams(algorithm=algorithm, metric='tani',
                           metric_threshold=threshold,
                           min_filters={'tani': threshold})
    return run_cluster(HEADER, rows, objects, params)


def groups(labels):
    out = {}
    for i, g in enumerate(labels):
        out.setdefault(g, set()).add(i)
    return sorted(out.values(), key=lambda s: min(s))


def test_complete_requires_all_edges():
    # chain 0-1-2: 2 touches 1 but not 0 -> must found its own cluster
    labels = cluster(3, [(0, 1, .9), (1, 2, .9)], 'complete')
    assert groups(labels) == [{0, 1}, {2}]


def test_complete_triangle_merges():
    labels = cluster(3, [(0, 1, .9), (1, 2, .9), (0, 2, .9)], 'complete')
    assert groups(labels) == [{0, 1, 2}]


def test_complete_tie_prefers_earliest_cluster():
    # clusters {0} and {1} both fully connected to 2; earliest ({0}) wins
    labels = cluster(3, [(0, 2, .9), (1, 2, .9)], 'complete')
    assert groups(labels) == [{0, 2}, {1}]


def test_uclust_best_weight_wins():
    # 2 connects to centroid 0 (w .8) and centroid 1 (w .95) -> joins 1
    labels = cluster(3, [(0, 2, .8), (1, 2, .95)], 'uclust')
    assert groups(labels) == [{0}, {1, 2}]


def test_uclust_tie_prefers_earliest_centroid():
    labels = cluster(3, [(0, 2, .9), (1, 2, .9)], 'uclust')
    assert groups(labels) == [{0, 2}, {1}]


def test_uclust_members_are_not_centroids():
    # 1 joins centroid 0; 2 connects only to 1 (not a centroid) -> founds
    labels = cluster(3, [(0, 1, .9), (1, 2, .9)], 'uclust')
    assert groups(labels) == [{0, 1}, {2}]


def test_cdhit_first_centroid_beats_better_weight():
    # unlike uclust, cd-hit takes the earliest centroid it touches
    labels = cluster(3, [(0, 2, .8), (1, 2, .95)], 'cd-hit')
    assert groups(labels) == [{0, 2}, {1}]


def test_set_cover_picks_biggest_hub_first():
    # star at 3 covering {2,4,5} (gain 3) beats 0-1 pair (gain 1)
    labels = cluster(6, [(3, 2, .9), (3, 4, .9), (3, 5, .9), (0, 1, .9)],
                     'set-cover')
    assert groups(labels) == [{0, 1}, {2, 3, 4, 5}]


def test_set_cover_tie_prefers_smallest_index():
    # two disjoint pairs: both gain 1; node 0 picked before node 2
    labels = cluster(4, [(2, 3, .9), (0, 1, .9)], 'set-cover')
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_set_cover_gains_shrink_as_nodes_get_covered():
    # 1 is a hub over {0,2,3}; 4 connects to 3 and 5. After the 1-pick
    # covers 3, node 4's gain drops to 1 (just 5).
    labels = cluster(6, [(1, 0, .9), (1, 2, .9), (1, 3, .9),
                         (4, 3, .9), (4, 5, .9)], 'set-cover')
    assert groups(labels) == [{0, 1, 2, 3}, {4, 5}]


@pytest.mark.parametrize('algorithm', ['complete', 'uclust', 'cd-hit',
                                       'set-cover'])
def test_threshold_filters_edges(algorithm):
    # edge below the metric threshold is invisible to every algorithm
    labels = cluster(2, [(0, 1, .4)], algorithm, threshold=0.5)
    assert labels[0] != labels[1]
