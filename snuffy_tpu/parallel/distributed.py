"""Multi-host bootstrap: the jax.distributed counterpart of the reference's
torch.distributed init paths.

The reference boots one process per GPU from env vars (torchrun), SLURM, or
a single-GPU fallback (reference dino_adapter/utils.py:473-513 gloo;
mae_adapter/util/misc.py:217-249 nccl), then rank-gates logging and
checkpoint writes. The TPU-native equivalent:

  * `initialize()` — call once per host process BEFORE any other JAX use;
    wires `jax.distributed.initialize` from explicit args, env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), or SLURM
    (auto-detected by jax). A no-op on a single host.
  * `global_mesh_spec()` — factor all visible devices into a MeshSpec whose
    dcn axis equals the process count, so the only DCN-crossing collective
    is the outer data-parallel all-reduce.
  * `is_primary()` / `primary_only` — process-0 gating for checkpoint and
    metric writes (the reference's `is_main_process` /
    `save_on_master`, dino_adapter/utils.py:449-471).
  * `process_batch_slice(global_batch)` — which rows of a globally-sharded
    batch this host must materialize (the DistributedSampler replacement:
    each host feeds only its own dcn block).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax

from snuffy_tpu.parallel.mesh import MeshSpec, factor_devices

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Tuple[int, ...]] = None,
) -> None:
    """Connect this process to the multi-host JAX runtime.

    Resolution order for each field: explicit argument → environment
    (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID) → jax auto-detection
    (SLURM / TPU pod metadata). With no configuration at all this is a
    single-process no-op, mirroring the reference's "Not using distributed
    mode" fallback (dino_adapter/utils.py:487-494).
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    in_slurm = "SLURM_JOB_ID" in os.environ and "SLURM_NTASKS" in os.environ
    if coordinator_address is None and not in_slurm:
        # Single-host: nothing to wire; jax.process_count() == 1.
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def is_primary() -> bool:
    """True on process 0 — the only process that writes checkpoints,
    metrics, and logs (reference utils.is_main_process)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Decorator: run `fn` on process 0 only (reference save_on_master,
    dino_adapter/utils.py:466-471). Returns None elsewhere."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None

    return wrapper


def global_mesh_spec() -> MeshSpec:
    """Factor every visible device (all hosts) into (dcn=process_count,
    dp, sp, tp)."""
    return factor_devices(jax.device_count(), jax.process_count())


def process_batch_slice(global_batch: int,
                        process_index: Optional[int] = None) -> slice:
    """Rows of a (global_batch, ...) array owned by this host.

    The batch axis shards over (dcn, dp); with devices grouped by process
    (mesh.make_mesh), host p owns the contiguous block
    [p·global_batch/P, (p+1)·global_batch/P). Each host materializes only
    its slice and hands it to `jax.make_array_from_process_local_data` —
    the DistributedSampler replacement.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    per = global_batch // n
    return slice(p * per, (p + 1) * per)
