"""Device mesh construction for data-parallel block codec work.

The codec's unit of parallelism is the independent compressed block (the
format's 64 KB match window never crosses our block boundary), so the
primary mesh axis is pure data parallelism over blocks; preset
dictionaries are replicated (broadcast over ICI once per batch).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (block) dimension across the mesh."""
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (preset dictionaries, config scalars)."""
    return NamedSharding(mesh, P())
