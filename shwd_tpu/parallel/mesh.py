"""Device mesh construction: the (data, slices) axes of the framework.

SURVEY.md §2.3: the reference has no intra-job distributed training — its
parallel dimensions are process-level (P1), batch (P2), projections (P3) and
phi-ensemble (P4). Here those become named mesh axes:

- ``data``:    cloud batch B sharded across devices (P2); losses reduce with
               psum via jnp reductions under shard_map / GSPMD.
- ``slices``:  the L random projections of sliced-OT sharded across devices
               (P3) — the tensor/sequence-parallel slot; each device solves
               L/D independent circle-OT problems, one psum-mean at the end.

Multi-host bootstrap goes through ``jax.distributed.initialize`` (DCN), then
the same mesh code spans all hosts' devices (ICI within a slice).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, slices: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, slices) mesh over the available devices.

    Defaults: all devices on the data axis. ``data * slices`` must equal the
    device count.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        data = n // slices
    assert data * slices == n, f"{data}x{slices} != {n} devices"
    arr = np.asarray(devs).reshape(data, slices)
    return Mesh(arr, ("data", "slices"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, 3) clouds sharded along batch over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frames_sharding(mesh: Mesh) -> NamedSharding:
    """(L, 3, 2) projection frames sharded along L over the slices axis."""
    return NamedSharding(mesh, P("slices"))


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap over DCN (no-op on a single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
