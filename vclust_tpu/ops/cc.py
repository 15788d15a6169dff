"""Connected components on TPU: iterative min-label propagation.

Device path for single-linkage clustering over huge sparse ANI graphs
(clusty's `single` algorithm, SURVEY.md section 2.6.2). Labels converge to
the minimum member index of each component — exactly the host union-find's
labels, so host and device paths are interchangeable.

Pointer jumping (label path compression) gives O(log n) rounds; each round
is two gathers + two scatter-mins + one gather, all VPU/HBM work with
static shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('n',))
def _cc_run(edges, n: int):
    e0 = edges[:, 0]
    e1 = edges[:, 1]

    def round_(state):
        labels, _ = state
        la = labels[e0]
        lb = labels[e1]
        m = jnp.minimum(la, lb)
        new = labels.at[e0].min(m)
        new = new.at[e1].min(m)
        # Pointer jumping: compress label chains.
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    def cond(state):
        return state[1]

    labels0 = jnp.arange(n, dtype=jnp.int32)
    first, changed = round_((labels0, jnp.bool_(True)))
    labels, _ = jax.lax.while_loop(
        cond, lambda s: round_(s), (first, changed))
    return labels


def connected_components_device(n: int, edges: np.ndarray) -> np.ndarray:
    """Min-index component label per node; edges (E, 2) int array."""
    if n == 0:
        return np.empty(0, dtype=np.int32)
    if len(edges) == 0:
        return np.arange(n, dtype=np.int32)
    edges = np.asarray(edges, dtype=np.int32)
    return np.asarray(_cc_run(jnp.asarray(edges), n))
