"""Device mesh helpers.

The framework uses a 1-2D logical mesh:
  * ``data``  — data-parallel axis: voxel micro-batches during training,
    gradient pmean over ICI (the TPU-native replacement for the reference's
    nominal ``jax.pmap`` helpers, ``neumors_inr_jax.ipynb §10``);
  * ``space`` — spatial axis: pixel-tile sharding for rendering (the
    workload's analog of context parallelism, SURVEY §5).

Multi-host: call ``initialize_distributed()`` once per process before mesh
creation; DCN links hosts, ICI links chips within a slice — shardings below
keep collectives on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (``jax.distributed``); no-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(data: int = 1, space: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    need = data * space
    if need > len(devices):
        raise ValueError(f"mesh {data}x{space} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def space_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "space"
    return NamedSharding(mesh, P(*spec))
