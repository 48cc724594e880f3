"""Fused dense self-attention kernel for long-token ViTs (e.g. ViT-S/8:
785 tokens per 224² patch — the DINO-adapter recipe backbone).

At n=197 (ViT-/16) XLA's batched einsum wins over every kernel we tried
(tools/profile_vit_attention*.py — kept as negative results). At n≈800 the
(z, n, n) score tensor is ~470 MB/layer of HBM traffic at extraction batch
sizes and the same kernel pattern WINS in isolation: 2.32 ms vs 3.84 ms
per layer on v5e (tools/profile_vit8_attention2.py). The whole
(bz, n_pad, n_pad) score block fits VMEM, so the softmax is exact (no
online rescaling), computed by one batched `dot_general` per grid step.

STATUS — measured, not wired into the ViT by default: inside the full
ViT-S/8 forward the end-to-end gain is ~0 (865 vs 870 img/s): XLA fuses
the in-model einsum chain (transposes into the qkv GEMM, softmax into its
neighbors) so its effective cost is far below the standalone probe, while
the kernel forces materialized+padded (z, n_pad, dk) operands and a
custom_vjp fusion barrier. Kept as a correct, tested primitive for
shapes/hardware where the balance tips (e.g. longer sequences, smaller
VMEM-relative batch).

Gradients: the kernel is forward-only; a `jax.custom_vjp` routes the
backward through the mathematically identical einsum formulation (one
recompute — the standard flash trade). No dropout inside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[...]                     # (BZ, n_pad, dk)
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                          # (BZ, n_pad, n_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -1e30)  # finite guard (see losses.py)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


# ~8 MB of f32 score block per grid step (16 MB scoped-VMEM limit, room
# for the q/k/v/o tiles).
_SCORE_BUDGET = 2 << 20


def _pick_bz(z: int, n_pad: int) -> int:
    bz = max(1, _SCORE_BUDGET // (n_pad * n_pad))
    while bz > 1 and z % bz:
        bz -= 1
    return bz


def _einsum_reference(q, k, v, n_valid: int, scale: float):
    s = jnp.einsum("znd,zmd->znm", q, k,
                   preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("znm,zmd->znd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel_call(q, k, v, n_valid: int, *, interpret: bool = False):
    """Raw kernel runner (also the test entry — CPU runs use
    interpret=True; `fused_self_attention` only dispatches here on TPU)."""
    z, n, dk = q.shape
    scale = dk ** -0.5
    n_pad = _round_up(n, 128)
    bz = _pick_bz(z, n_pad)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    spec = pl.BlockSpec((bz, n_pad, dk), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((z, n_pad, dk), q.dtype),
        grid=(z // bz,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * z * n_pad * n_pad * dk,
            bytes_accessed=4 * z * n_pad * dk * 2,
            transcendentals=z * n_pad * n_pad,
        ),
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(q, k, v, n_valid: int):
    """softmax(q·kᵀ/√dk)·v over the first `n_valid` key columns.

    q/k/v: (z, n, dk) — heads folded into the leading dim. Returns
    (z, n, dk). On non-TPU backends this is the plain einsum (the Pallas
    interpreter would be far slower than XLA:CPU)."""
    if jax.default_backend() != "tpu":
        return _einsum_reference(q, k, v, n_valid, q.shape[-1] ** -0.5)
    return _kernel_call(q, k, v, n_valid)


def _fwd(q, k, v, n_valid):
    return fused_self_attention(q, k, v, n_valid), (q, k, v)


def _bwd(n_valid, res, g):
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _einsum_reference(q_, k_, v_, n_valid, scale),
        q, k, v,
    )
    return vjp(g)


fused_self_attention.defvjp(_fwd, _bwd)
