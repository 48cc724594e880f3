"""Data-parallel sharding for the SSL trainers.

The SSL steps (ssl/dino.py, ssl/mae_trainer.py) are pure jitted functions;
scaling them over chips is placement, not code: put the image batch on the
dp axis of the mesh and replicate the state — GSPMD turns the gradient
means into psums over ICI (the DDP all-reduce of reference
dino_adapter/utils.py:473-513 and mae_adapter/util/misc.py:217-249, without
any process groups). The DINO center update is a global batch mean, so its
dist.all_reduce (reference main_dino_adapter.py:666-668) also falls out of
the sharded mean automatically.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_mesh(n_devices: int | None = None, local: bool = False) -> Mesh:
    """1-D dp mesh. `local=True` spans only THIS host's devices (for
    per-host data parallelism where hosts already split the work, e.g.
    extraction over disjoint bags)."""
    import numpy as np

    devices = jax.local_devices() if local else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("dp",))


def shard_images(batch, mesh: Mesh):
    """(B, H, W, C) image batch → B sharded over dp."""
    spec = P("dp", *([None] * (batch.ndim - 1)))
    return jax.device_put(batch, NamedSharding(mesh, spec))


def shard_crops(crops, mesh: Mesh):
    """(V, B, H, W, C) multi-crop stack → B (axis 1) sharded over dp."""
    spec = P(None, "dp", None, None, None)
    return jax.device_put(crops, NamedSharding(mesh, spec))


def replicate_state(state: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def shard_batch_global(batch, mesh: Mesh):
    """Process-local (B_local, ...) rows → the global dp-sharded array.

    Single-process: a device_put across the mesh's dp axis. Multi-host:
    each host hands its local rows to
    `jax.make_array_from_process_local_data` (the DistributedSampler
    replacement — hosts feed disjoint row blocks, see
    parallel/distributed.py:process_batch_slice). Works for any rank;
    axis 0 is the batch axis.
    """
    import numpy as np

    spec = P("dp", *([None] * (batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    me = jax.process_index()
    if jax.process_count() == 1 or all(
        d.process_index == me for d in mesh.devices.flat
    ):
        # single process, or a host-LOCAL mesh: plain placement
        return jax.device_put(batch, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(batch)
    )
