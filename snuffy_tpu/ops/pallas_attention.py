"""Fused Pallas TPU kernel for the Snuffy inverted sparse attention.

Semantics identical to `snuffy_tpu.ops.sparse_attention.
inverted_sparse_attention` (the XLA oracle; reference snuffy.py:160-168):

    p[i, j] = softmax_j(q_i · k_j / √dk)   over the Λ selected slots
    out[j]  = Σ_i p[i, j] · v_i            (transpose-matmul, only Λ rows)

The XLA path materializes p (h, N, S) in HBM — at N=16k, S=512, h=4 that is
~134 MB of traffic per layer, pure HBM-bandwidth waste. This kernel is
flash-style: it tiles the N axis, computes each (TN, S) score block in VMEM,
softmaxes it exactly (S always fits in one block — Λ ∈ {128..1024}), and
accumulates p_blockᵀ @ v_block into an f32 VMEM accumulator. Nothing of
size N×S ever leaves the chip.

Both matmuls are MXU-shaped: (TN, dk) @ (dk, S) and (S, TN) @ (TN, dk).
dk is zero-padded to a lane multiple (128) by the wrapper; zero tail dims
contribute nothing to either product.

The backward recomputes p per N-tile (flash-style) and accumulates
dq/dk/dv in the same pass — see `_bwd_kernel`. No dropout in-kernel:
the training path applies attention dropout only when rate > 0, in which
case the wrapper falls back to the XLA oracle (dropout needs the
materialized p anyway for the reference's bernoulli-on-p semantics).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30  # used instead of -inf: keeps 0·mask arithmetic finite


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------- forward


def _fwd_kernel(q_ref, k_ref, v_ref, kmask_ref, qmask_ref, out_ref, acc_ref, *, scale):
    """Grid (h, N/TN). Blocks: q/v (TN, dk), k (S, dk), masks (1, ·),
    out (S, dk). acc_ref: f32 (S, dk) VMEM scratch."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # (TN, dk)
    k = k_ref[0]                       # (S, dk)
    v = v_ref[0]                       # (TN, dk)
    kmask = kmask_ref[0, :]            # (S,) float {0,1} — Mosaic dislikes
    qmask = qmask_ref[0, :]            # (TN,)  i1 vector reshapes, so masks
                                       # arrive as f32 and masking is
                                       # arithmetic (32-bit ops only).
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # (TN, S)
    scores = scores * kmask[None, :] + NEG_BIG * (1.0 - kmask[None, :])
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p * qmask[:, None]             # dead query rows contribute 0

    acc_ref[:] += jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                   # (S, dk)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(q, k, v, kmask, qmask, *, scale, tile_n):
    h, n, dk = q.shape
    s = k.shape[1]
    grid = (h, pl.cdiv(n, tile_n))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((h, s, dk), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda hh, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s, dk), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * h * n * s * dk,
            bytes_accessed=4 * h * n * dk * 2 + 4 * h * s * dk,
            transcendentals=h * n * s,
        ),
        interpret=_interpret_default(),
    )(q, k, v, kmask, qmask)


# ---------------------------------------------------------------- backward


def _bwd_kernel(
    q_ref, k_ref, v_ref, kmask_ref, qmask_ref, g_ref,
    dq_ref, dk_ref, dv_ref, dk_acc_ref, *, scale
):
    """Grid (h, N/TN). g: (S, dk) cotangent of out. Recompute p per tile.

      dv_i  = Σ_j p_ij g_j                    (TN, dk)
      dp_ij = v_i · g_j                       (TN, S)
      ds    = p ⊙ (dp − rowsum(p ⊙ dp))       softmax vjp, rowsum = v·dv
      dq_i  = scale · Σ_j ds_ij k_j           (TN, dk)
      dk_j  = scale · Σ_i ds_ij q_i           (S, dk), accumulated over tiles
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]                       # (S, dk)
    kmask = kmask_ref[0, :]
    qmask = qmask_ref[0, :]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores * kmask[None, :] + NEG_BIG * (1.0 - kmask[None, :])
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    p = p * qmask[:, None]                   # (TN, S)

    dv = jax.lax.dot_general(                # p @ g : (TN, dk)
        p, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(                # v @ gᵀ : (TN, S)
        v, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    rowsum = jnp.sum(v.astype(jnp.float32) * dv, axis=-1, keepdims=True)
    ds = p * (dp - rowsum)                   # (TN, S)

    dq_ref[0] = (scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )).astype(dq_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dk_acc_ref[:] += scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)


def _bwd_call(q, k, v, kmask, qmask, g, *, scale, tile_n):
    h, n, dk = q.shape
    s = k.shape[1]
    grid = (h, pl.cdiv(n, tile_n))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((h, n, dk), q.dtype),
            jax.ShapeDtypeStruct((h, s, dk), k.dtype),
            jax.ShapeDtypeStruct((h, n, dk), v.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda hh, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((s, dk), jnp.float32)],
        interpret=_interpret_default(),
    )(q, k, v, kmask, qmask, g)


# --------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _sparse_attention_padded(q, k, v, kmask, qmask, scale, tile_n):
    return _fwd_call(q, k, v, kmask, qmask, scale=scale, tile_n=tile_n)


def _sa_fwd(q, k, v, kmask, qmask, scale, tile_n):
    out = _fwd_call(q, k, v, kmask, qmask, scale=scale, tile_n=tile_n)
    return out, (q, k, v, kmask, qmask)


def _sa_bwd(scale, tile_n, res, g):
    q, k, v, kmask, qmask = res
    dq, dk, dv = _bwd_call(
        q, k, v, kmask, qmask, g, scale=scale, tile_n=tile_n
    )
    return dq, dk, dv, None, None


_sparse_attention_padded.defvjp(_sa_fwd, _sa_bwd)


def fused_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, N, dk)
    k: jnp.ndarray,           # (h, S, dk)
    v: jnp.ndarray,           # (h, N, dk)
    slot_valid: jnp.ndarray,  # (S,) bool
    q_valid: jnp.ndarray,     # (N,) bool
    *,
    tile_n: int = 512,
) -> jnp.ndarray:
    """Fused (no p materialization) inverted sparse attention → (h, S, dk).

    Pads dk → ×128 lanes, S → ×128, N → ×tile_n; padding is mask-dead.
    """
    h, n, dk = q.shape
    s = k.shape[1]
    dk_p = _round_up(dk, 128)
    s_p = _round_up(s, 128)
    n_p = _round_up(n, tile_n)

    def pad3(x, nn, cc):
        return jnp.pad(x, ((0, 0), (0, nn - x.shape[1]), (0, cc - x.shape[2])))

    qp = pad3(q, n_p, dk_p)
    kp = pad3(k, s_p, dk_p)
    vp = pad3(v, n_p, dk_p)
    kmask = jnp.pad(
        slot_valid.astype(jnp.float32), (0, s_p - s)
    ).reshape(1, s_p)
    qmask = jnp.pad(
        q_valid.astype(jnp.float32), (0, n_p - n)
    ).reshape(1, n_p)

    scale = 1.0 / (dk ** 0.5)
    out = _sparse_attention_padded(qp, kp, vp, kmask, qmask, scale, tile_n)
    return out[:, :s, :dk]
