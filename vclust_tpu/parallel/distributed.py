"""Multi-host runtime: jax.distributed init + global meshes + host gather.

The reference is single-node (SURVEY.md L4: "no distributed runtime");
this is the TPU-native scale-out layer SURVEY.md section 5.8/7 specifies:
one process per host (`jax.distributed.initialize`), a mesh spanning all
processes' devices, sketches/arenas replicated via DCN all-gather, the
pair grid row/chunk-sharded so per-device compute rides the ICI-local
paths already used by the single-host mesh code (ops/prefilter.py
_make_sharded_accum_w, ops/align_tpu.py _make_sharded_group_run).

Environment contract (one process per host):

    VCLUST_DIST_COORD   coordinator address, e.g. "10.0.0.1:9911"
    VCLUST_DIST_NPROCS  total number of processes
    VCLUST_DIST_PROCID  this process's id (0-based)

`maybe_initialize()` is a no-op unless all three are set, so single-host
use is unchanged. `local_devices` may be passed for CPU-backend tests
(each process exposes N virtual devices via
--xla_force_host_platform_device_count).

Tested by tests/test_multihost.py: 2 real OS processes x 4 virtual CPU
devices run the real sharded prefilter matmul and align group-run over
one 8-device global mesh and must match the single-process oracle
bit-for-bit.
"""

import os
from typing import Optional

import numpy as np


def maybe_initialize() -> bool:
    """Initialize jax.distributed from the env contract. Returns True when
    running multi-process (after this, jax.devices() spans all hosts)."""
    coord = os.environ.get('VCLUST_DIST_COORD')
    nprocs = os.environ.get('VCLUST_DIST_NPROCS')
    procid = os.environ.get('VCLUST_DIST_PROCID')
    if not (coord and nprocs and procid):
        return False
    import jax
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nprocs),
        process_id=int(procid))
    return True


def global_mesh(axis: str = 'pairs'):
    """1-D mesh over every device of every process (DCN x ICI flattened:
    the sharded axis is laid out process-major, so a row shard's devices
    are ICI-local and only the replicated operands cross DCN)."""
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def fetch(arr) -> np.ndarray:
    """Device->host fetch that works for both single-process arrays and
    multi-process (non-fully-addressable) global arrays."""
    if getattr(arr, 'is_fully_addressable', True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def replicate(mesh, x):
    """Place a host array replicated over a (possibly multi-process) mesh.
    Every process must pass the same value (the sketch-allgather analog:
    the genome arena is replicated host-side, sharded work reads it
    locally)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_rows(mesh, x):
    """Place a host array row-sharded over the mesh axis; under
    multi-process each process places only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(
        x, NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (x.ndim - 1)))))


def process_info() -> Optional[tuple]:
    """(process_id, num_processes) when distributed, else None."""
    import jax
    n = jax.process_count()
    if n <= 1:
        return None
    return jax.process_index(), n
