"""Device mesh construction and sharding helpers.

The reference is single-process/serial (SURVEY §2.3); all distribution here
is new capability.  Axes:
  * ``pairs`` — data parallelism over adjacent image pairs (registration)
  * ``edges`` — pose-graph edges (solver)
  * ``blocks``— canvas blocks (sharded composition)

One physical mesh axis serves all three (they are different names for the
same DP axis at different pipeline stages).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pair_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (pair/edge/block) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
