"""Device-mesh sharding for the all-vs-all pair grid.

The reference scales by out-of-core batching on one node (SURVEY.md section
5.7). The TPU-native distribution (section 7): genome sketches/occupancy
blocks are sharded over a 1-D mesh along the genome axis; each device
computes one row-block of the pair-count grid against an all-gathered column
panel, so collectives ride ICI and each device's matmul stays MXU-shaped.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(n_devices: int = None, axis: str = 'pairs') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def auto_mesh(axis: str = 'pairs'):
    """Mesh over all visible devices, or None when only one is present."""
    return make_mesh(axis=axis) if len(jax.devices()) > 1 else None


def sharded_pair_counts(mesh: Mesh, occ: jnp.ndarray) -> jnp.ndarray:
    """counts = occ @ occ.T with the genome axis sharded over the mesh.

    occ: (G, M) {0,1} occupancy block, G divisible by mesh size. Each device
    holds a row shard, all-gathers the partner panel along the mesh axis and
    emits its row-block of the G x G counts.
    """
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=P(axis, None), out_specs=P(axis, None))
    def _block(occ_local):
        occ_all = jax.lax.all_gather(occ_local, axis, tiled=True)
        return jnp.dot(occ_local, occ_all.T,
                       preferred_element_type=jnp.float32)

    return _block(occ)


def sharded_prefilter_step(mesh: Mesh, occ: jnp.ndarray, sizes: jnp.ndarray,
                           k: int, min_ident: float, min_kmers: int):
    """Full sharded prefilter step: pair counts + ani-shorter conversion +
    thresholding; returns (counts, keep_mask, n_candidates).

    This is the distributed "training step" analog used by the multi-chip
    dry run: row-sharded matmul, all-gather over ICI, elementwise VPU math,
    and a psum reduction for the global candidate count.
    """
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(None,)),
             out_specs=(P(axis, None), P(axis, None), P()))
    def _step(occ_local, sizes_all):
        occ_all = jax.lax.all_gather(occ_local, axis, tiled=True)
        counts = jnp.dot(occ_local, occ_all.T,
                         preferred_element_type=jnp.float32)
        my = jax.lax.axis_index(axis)
        rows_per = occ_local.shape[0]
        row_ids = my * rows_per + jax.lax.broadcasted_iota(
            jnp.int32, counts.shape, 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1)
        sizes_f = sizes_all.astype(jnp.float32)
        min_sz = jnp.minimum(sizes_f[row_ids], sizes_f[col_ids])
        c = counts / jnp.maximum(min_sz, 1.0)
        sim = 1.0 + jnp.log(2.0 * c / (1.0 + c)) / k
        keep = ((counts >= min_kmers) & (sim >= min_ident)
                & (col_ids < row_ids))
        n_local = jnp.sum(keep.astype(jnp.int32))
        n_total = jax.lax.psum(n_local, axis)
        return counts, keep, n_total

    return _step(occ, sizes)
