"""Device mesh construction and multi-host initialization.

The reference is single-process NumPy with no parallelism of any kind
(SURVEY.md §2.3). The TPU-native scale-out axis for this workload is the
*batch of surfaces* (and within it, the multi-start batch): thousands of
independent 13-parameter calibrations sharded across chips with XLA
collectives only at stat-aggregation time.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SURFACE_AXIS = "surfaces"


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: wraps jax.distributed.initialize.

    No-op for single-process runs (the common case in this repo's CI); on a
    pod slice each host calls this before building the global mesh.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None,
              axis: str = SURFACE_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ``n_devices`` (default: all) along the surface axis.

    The calibration workload is embarrassingly parallel over surfaces, so a
    1-D mesh riding ICI is the right topology; a second axis (e.g. starts)
    can be added by reshaping the device array if surface counts are small.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = SURFACE_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m >= n (shard counts must divide evenly)."""
    return ((n + m - 1) // m) * m
