"""Device mesh construction and canonical shardings."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              batch: Optional[int] = None,
              grid: Optional[int] = None) -> Mesh:
    """Create a ("batch", "grid") mesh over the given (or all) devices.

    batch × grid must equal the device count; by default all devices go to
    the batch axis (the common watermarking-fleet shape).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if batch is None and grid is None:
        batch, grid = n, 1
    elif batch is None:
        batch = n // grid
    elif grid is None:
        grid = n // batch
    if batch * grid != n:
        raise ValueError(f"mesh {batch}x{grid} != {n} devices")
    arr = np.asarray(devices).reshape(batch, grid)
    return Mesh(arr, ("batch", "grid"))


_STREAM_MESH: list = []  # memo cell: [Optional[Mesh]] once resolved


def stream_mesh() -> Optional[Mesh]:
    """1-D "batch" mesh over this process's local devices for the streaming
    compose path, or None when only one device is addressable.

    The shipped hot path (BatchComposer packed compose) shards each packed
    batch over this mesh so a multi-chip host drives ALL its local chips
    (BASELINE config-3: "sharded across chips"), not chip 0.  Config hook:
    MJT_STREAM_CHIPS=k caps the mesh to k devices (0/1 disables sharding).
    """
    if _STREAM_MESH:
        return _STREAM_MESH[0]
    import os

    devices = list(jax.local_devices())
    cap = os.environ.get("MJT_STREAM_CHIPS")
    if cap is not None:
        devices = devices[:max(0, int(cap))]
    mesh = (Mesh(np.asarray(devices), ("batch",))
            if len(devices) > 1 else None)
    _STREAM_MESH.append(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[N, Hb, Wb, 8, 8] image batches: shard the leading batch axis."""
    return NamedSharding(mesh, P("batch"))


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """[Hb, Wb, 8, 8] single-image block grid: shard block rows over the
    grid axis (block-local compose means no halo is needed; XLA inserts the
    slice exchange for overlay regions crossing shard boundaries)."""
    return NamedSharding(mesh, P("grid"))
