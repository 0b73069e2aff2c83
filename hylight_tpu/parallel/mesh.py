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
