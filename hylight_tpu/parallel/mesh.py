"""Device mesh helpers.

The reference's only parallelism is a file split + ``xargs -P`` process farm
on one node (``utils.py:41-71``, SURVEY.md §2.5). The TPU-native equivalent
is a 1-D data mesh over reads/pairs; all collective structure (index
all_gather, stat psum, future bucket all_to_all) rides this axis over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = SHARD_AXIS) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rows(mesh: Mesh, axis: str = SHARD_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize multi-host execution (jax.distributed over DCN).

    The reference has no distributed backend at all — its scale-out is a
    file split on one node (SURVEY.md §2.5). Here multi-host runs use the
    standard JAX recipe: every host calls this once before building meshes;
    ``jax.devices()`` then spans all hosts and the 1-D shard mesh covers
    the pod slice. The ring/bucket exchanges in sharded_overlap ride ICI
    within a host and DCN across hosts transparently (the mesh axis order
    from ``jax.devices()`` keeps intra-host neighbours adjacent, so each
    ring hop crosses DCN at most twice per revolution).

    On TPU pods with the standard runtime, all three arguments are
    auto-detected (call with no args); set them explicitly for CPU/GPU
    multi-process runs.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = SHARD_AXIS) -> Mesh:
    """Mesh over ALL devices of all connected hosts (call after
    init_multihost on every participating process)."""
    return Mesh(np.array(jax.devices()), (axis,))


def put_global_rows(mesh: Mesh, host_array, axis: str = SHARD_AXIS):
    """Build a globally row-sharded array from per-host numpy data.

    Each process passes ITS OWN shard rows (the host-local slice of the
    global [N, ...] array); the result is one global jax.Array sharded over
    the mesh — the multi-host analogue of device_put(x, shard_rows(mesh)).
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, host_array)
