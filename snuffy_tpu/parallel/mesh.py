"""Device-mesh construction: the communication layer of the framework.

Replaces the reference's torch.distributed bootstrap (reference
dino_adapter/utils.py:473-513 gloo, mae_adapter/util/misc.py:217-249 nccl,
DDP + DistributedSampler) with a single `jax.sharding.Mesh` over ICI/DCN.
Axes:

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

AXES = ("dp", "sp", "tp")


@dataclass(frozen=True)
class MeshSpec:
    dp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def n_devices(self) -> int:
        return self.dp * self.sp * self.tp


def factor_devices(n: int) -> MeshSpec:
    """Default factorization of n devices into (dp, sp, tp).

    Preference order: data parallel first (MIL/SSL throughput), then
    sequence parallel (long bags), then tensor parallel. Powers of two only;
    remainders fold into dp.
    """
    if n <= 1:
        return MeshSpec(1, 1, 1)
    sp = 2 if n % 2 == 0 else 1
    rem = n // sp
    tp = 2 if rem % 2 == 0 and rem > 2 else 1
    dp = n // (sp * tp)
    return MeshSpec(dp, sp, tp)


def make_mesh(spec: MeshSpec, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < spec.n_devices:
        raise ValueError(
            f"MeshSpec needs {spec.n_devices} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: spec.n_devices]).reshape(spec.dp, spec.sp, spec.tp)
    return Mesh(arr, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def bag_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, D) bag batches: B over dp, N over sp, D replicated."""
    return NamedSharding(mesh, P("dp", "sp", None))


def bag_mask_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", "sp"))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
