"""Device-mesh construction: the communication layer of the framework.

Replaces the reference's torch.distributed bootstrap (reference
dino_adapter/utils.py:473-513 gloo, mae_adapter/util/misc.py:217-249 nccl,
DDP + DistributedSampler) with a single `jax.sharding.Mesh` over ICI/DCN.
Axes:

  dcn — outer data-parallel axis across hosts (processes); device blocks are
       grouped per process so only this axis's all-reduce crosses the
       data-center network. Size 1 on a single host.
  dp — data parallel: batches of bags (MIL) or images (SSL) split across
       devices; gradients psum'd by XLA (the DDP all-reduce equivalent).
  sp — sequence parallel: the N (patch-token) axis of a bag sharded across
       devices for ultra-long bags; top-k/softmax collectives are inserted
       by GSPMD.
  tp — tensor parallel: attention heads / FFN hidden dim of the encoder
       sharded Megatron-style.

All three are expressed as NamedSharding annotations under one `jit`; XLA
chooses the collectives (psum / all-gather / reduce-scatter) and rides ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dcn", "dp", "sp", "tp")


def ensure_virtual_devices(n: int) -> None:
    """Guarantee >= n local JAX devices, provisioning a virtual CPU platform
    if the process sees fewer (e.g. the single axon TPU chip).

    This is the harness contract for multi-chip dry runs on single-chip rigs:
    re-point JAX at the host CPU platform with `n` virtual devices. Works even
    if a backend was already initialized (clear first, then reconfigure —
    `jax_num_cpu_devices` refuses updates while any backend is live).
    """
    if jax.device_count() >= n:
        return
    from jax.extend import backend as _xb

    _xb.clear_backends()
    jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_platforms", "cpu")
    got = jax.device_count()
    if got < n:
        raise RuntimeError(
            f"virtual CPU provisioning yielded {got} devices, wanted {n}"
        )


@dataclass(frozen=True)
class MeshSpec:
    """4-axis mesh factorization.

    dcn — outer data-parallel axis ACROSS hosts. Gradient all-reduces on
          this axis ride the data-center network; everything else must stay
          within a host's ICI domain, which is why dcn is outermost and
          device blocks are grouped by process in `make_mesh`.
    dp/sp/tp — within-host (ICI) axes, see module docstring.
    """

    dp: int = 1
    sp: int = 1
    tp: int = 1
    dcn: int = 1

    @property
    def n_devices(self) -> int:
        return self.dcn * self.dp * self.sp * self.tp


def factor_devices(n: int, num_processes: int = 1) -> MeshSpec:
    """Default factorization of n devices into (dcn=num_processes, dp, sp, tp).

    Preference order for the n/num_processes per-host devices: sequence
    parallel gets 2 (long bags), tensor parallel gets 2 when >=8 per host,
    and the remainder — any integer, not necessarily a power of two — goes
    to data parallel.
    """
    if n % num_processes:
        raise ValueError(
            f"{n} devices do not split evenly over {num_processes} processes"
        )
    local = n // num_processes
    if local <= 1:
        return MeshSpec(1, 1, 1, dcn=num_processes)
    sp = 2 if local % 2 == 0 else 1
    rem = local // sp
    tp = 2 if rem % 2 == 0 and rem > 2 else 1
    dp = local // (sp * tp)
    return MeshSpec(dp, sp, tp, dcn=num_processes)


def validate_spec(spec: MeshSpec, num_heads: Optional[int] = None,
                  mlp_hidden: Optional[int] = None) -> None:
    """Model-shape validation for tensor parallelism (Megatron rules shard
    heads over tp and the FFN hidden dim over tp)."""
    if num_heads is not None and num_heads % spec.tp:
        raise ValueError(f"tp={spec.tp} does not divide num_heads={num_heads}")
    if mlp_hidden is not None and mlp_hidden % spec.tp:
        raise ValueError(f"tp={spec.tp} does not divide FFN hidden={mlp_hidden}")


def make_mesh(
    spec: MeshSpec,
    devices: Optional[Sequence] = None,
    num_heads: Optional[int] = None,
) -> Mesh:
    """Build the (dcn, dp, sp, tp) mesh.

    Devices are sorted by (process_index, id) so each contiguous block of
    local devices belongs to one process; with dcn == num_processes the dcn
    axis then falls exactly on host boundaries (collectives over dp/sp/tp
    stay on ICI, only the dcn all-reduce crosses DCN). This is the mesh-layout
    counterpart of the reference's one-process-per-GPU torch.distributed
    bootstrap (reference dino_adapter/utils.py:473-513).
    """
    validate_spec(spec, num_heads)
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < spec.n_devices:
        raise ValueError(
            f"MeshSpec needs {spec.n_devices} devices, have {len(devices)}"
        )
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices[: spec.n_devices]).reshape(
        spec.dcn, spec.dp, spec.sp, spec.tp
    )
    return Mesh(arr, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# The batch axis shards over BOTH data-parallel axes (hosts × local dp).
BATCH_AXES = ("dcn", "dp")


def bag_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, D) bag batches: B over dcn×dp, N over sp, D replicated."""
    return NamedSharding(mesh, P(BATCH_AXES, "sp", None))


def bag_mask_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES, "sp"))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES, None))
