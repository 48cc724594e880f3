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

Attention-probability dropout (the reference's bernoulli-on-p,
snuffy.py:167/181) runs INSIDE the kernel: the keep mask is a counter-based
murmur-style integer hash of (head, row, col, seed) — pure int32 arithmetic,
so it is bitwise identical between forward and backward recomputation and
works on every backend (the TPU hardware PRNG has no CPU interpreter
lowering).

Masks arrive as float32 and masking is arithmetic — Mosaic rejects i1
vector reshapes ("Insertion of minor dim that is not a no-op...").

The backward recomputes p per N-tile (flash-style) and accumulates
dq/dk/dv in one pass. Both matmuls per tile are MXU-shaped; dk is
zero-padded to a 128 lane multiple by the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30  # used instead of -inf: keeps 0·mask arithmetic finite

# murmur3-style mixing constants (wrapped int32 values as Python ints —
# jnp arrays at module level would be captured as tracer constants by the
# kernels)
_C1 = -1640531527   # 0x9E3779B9
_C2 = -2048144789   # 0x85EBCA6B
_C3 = -1028477387   # 0xC2B2AE35


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _keep_factor(seed, h_idx, i_idx, tile_n: int, s: int, rate: float):
    """(TN, S) float32 keep/(1−rate) mask from a counter-based hash.

    Deterministic in (seed, head, global row, col) — regenerated bit-exactly
    in the backward pass.
    """
    c1 = jnp.int32(_C1)
    c2 = jnp.int32(_C2)
    c3 = jnp.int32(_C3)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_n, s), 0) + i_idx * tile_n
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, s), 1)
    x = (row * c1) ^ (col * c2) ^ (seed + h_idx * c3)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * c2
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * c3
    x = x ^ jax.lax.shift_right_logical(x, 16)
    u = (x & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (1.0 / 16777216.0)
    keep = (u >= rate).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _softmax_block(q, k, kmask, scale):
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # (TN, S)
    scores = scores * kmask[None, :] + NEG_BIG * (1.0 - kmask[None, :])
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# ----------------------------------------------------------------- forward


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, kmask_ref, qmask_ref,
                out_ref, acc_ref, *, scale, rate, seg_masks=False):
    """Grid (h, N/TN). Blocks: q/v (TN, dk), k (S, dk), masks (1, ·) — or
    (1, 8, ·) per-segment when seg_masks (packed bags: Mosaic needs the
    last two block dims (8, lanes)-tiled once the mask array gains a
    segment axis) — out (S, dk). acc_ref: f32 (S, dk) VMEM scratch."""
    hh = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # (TN, dk)
    k = k_ref[0]                       # (S, dk)
    v = v_ref[0]                       # (TN, dk)
    if seg_masks:
        kmask = kmask_ref[0, 0, :]     # (S,) float {0,1}
        qmask = qmask_ref[0, 0, :]     # (TN,)
    else:
        kmask = kmask_ref[0, :]        # (S,) float {0,1}
        qmask = qmask_ref[0, :]        # (TN,)

    p = _softmax_block(q, k, kmask, scale)
    p = p * qmask[:, None]             # dead query rows contribute 0
    if rate > 0.0:
        p = p * _keep_factor(seed_ref[0, 0], hh, i, q.shape[0], k.shape[0],
                             rate)

    acc_ref[:] += jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                   # (S, dk)

    @pl.when(i == pl.num_programs(1) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _mask_specs(segments: int, s: int, tile_n: int):
    """BlockSpecs for the key/row mask operands.

    segments=1 keeps the original 2-D (1, ·) full-array blocks (and the
    original compiled program) byte-identical. segments>1 masks arrive
    (segments, 8, ·): Mosaic requires the last two block dims to be
    (8, 128)-tiled once the array gains a segment axis, so the mask rides
    a replicated 8-row sublane tile; hh is the folded head-major grid axis
    (hh = head·segments + segment), so segment = hh % segments."""
    if segments == 1:
        return (
            pl.BlockSpec((1, s), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda hh, i: (0, i),
                         memory_space=pltpu.VMEM),
        )
    return (
        pl.BlockSpec((1, 8, s), lambda hh, i: (hh % segments, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, tile_n), lambda hh, i: (hh % segments, 0, i),
                     memory_space=pltpu.VMEM),
    )


def _fwd_call(seed, q, k, v, kmask, qmask, *, scale, rate, tile_n,
              segments=1):
    h, n, dk = q.shape
    s = k.shape[1]
    grid = (h, pl.cdiv(n, tile_n))
    kmask_spec, qmask_spec = _mask_specs(segments, s, tile_n)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate,
                          seg_masks=segments > 1),
        out_shape=jax.ShapeDtypeStruct((h, s, dk), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            kmask_spec,
            qmask_spec,
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
    )(seed, q, k, v, kmask, qmask)


# ---------------------------------------------------------------- backward


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, kmask_ref, qmask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dk_acc_ref, *, scale, rate,
                seg_masks=False):
    """Grid (h, N/TN). g: (S, dk) cotangent of out. Recompute σ per tile.

    With factor f = qmask·keep/(1−rate) and p̃ = σ ⊙ f:
      dv_i  = Σ_j p̃_ij g_j                    (TN, dk)
      dσ    = (v @ gᵀ) ⊙ f                    (TN, S)
      ds    = σ ⊙ (dσ − rowsum(σ ⊙ dσ))       softmax vjp
      dq_i  = scale · Σ_j ds_ij k_j           (TN, dk)
      dk_j  = scale · Σ_i ds_ij q_i           (S, dk), accumulated
    """
    hh = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]                       # (S, dk)
    if seg_masks:
        kmask = kmask_ref[0, 0, :]
        qmask = qmask_ref[0, 0, :]
    else:
        kmask = kmask_ref[0, :]
        qmask = qmask_ref[0, :]

    sigma = _softmax_block(q, k, kmask, scale)
    factor = qmask[:, None]
    if rate > 0.0:
        factor = factor * _keep_factor(seed_ref[0, 0], hh, i, q.shape[0],
                                       k.shape[0], rate)
    p = sigma * factor                       # (TN, S)

    dv = jax.lax.dot_general(                # p @ g : (TN, dk)
        p, g, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dsig = jax.lax.dot_general(              # v @ gᵀ : (TN, S)
        v, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * factor
    rowsum = jnp.sum(sigma * dsig, axis=-1, keepdims=True)
    ds = sigma * (dsig - rowsum)             # (TN, S)

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


def _bwd_call(seed, q, k, v, kmask, qmask, g, *, scale, rate, tile_n,
              segments=1):
    h, n, dk = q.shape
    s = k.shape[1]
    grid = (h, pl.cdiv(n, tile_n))
    kmask_spec, qmask_spec = _mask_specs(segments, s, tile_n)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate,
                          seg_masks=segments > 1),
        out_shape=(
            jax.ShapeDtypeStruct((h, n, dk), q.dtype),
            jax.ShapeDtypeStruct((h, s, dk), k.dtype),
            jax.ShapeDtypeStruct((h, n, dk), v.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda hh, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, dk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, dk), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            kmask_spec,
            qmask_spec,
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
    )(seed, q, k, v, kmask, qmask, g)


# --------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _sparse_attention_padded(seed, q, k, v, kmask, qmask, scale, rate,
                             tile_n, segments=1):
    return _fwd_call(seed, q, k, v, kmask, qmask, scale=scale, rate=rate,
                     tile_n=tile_n, segments=segments)


def _sa_fwd(seed, q, k, v, kmask, qmask, scale, rate, tile_n, segments=1):
    out = _fwd_call(seed, q, k, v, kmask, qmask, scale=scale, rate=rate,
                    tile_n=tile_n, segments=segments)
    return out, (seed, q, k, v, kmask, qmask)


def _sa_bwd(scale, rate, tile_n, segments, res, g):
    seed, q, k, v, kmask, qmask = res
    dq, dk, dv = _bwd_call(seed, q, k, v, kmask, qmask, g, scale=scale,
                           rate=rate, tile_n=tile_n, segments=segments)
    return None, dq, dk, dv, None, None


_sparse_attention_padded.defvjp(_sa_fwd, _sa_bwd)


def _fit_tile_n(tile_n: int, s_p: int) -> int:
    """VMEM guard: the backward kernel holds ~two f32 (tile_n, s_p) score
    buffers plus the q/k/v/g tiles in scoped VMEM (16 MB hard limit). At
    the Λ=900 recipe (s_p=1024) the 2048 default tile is a 20.3 MB scoped
    allocation → compile error on real TPU (interpret mode has no limit,
    so only on-chip runs see it). Halve the tile until the score blocks
    fit (~12 MB budget leaves room for the operand tiles); below the
    128-row floor the budget is unreachable, so fail loudly instead of
    shipping a kernel that only dies at on-chip compile time."""
    while tile_n > 128 and tile_n * s_p > (3 << 19):
        tile_n //= 2
    if tile_n * s_p > (3 << 19):
        raise ValueError(
            f"fused sparse attention cannot fit VMEM: padded slot count "
            f"{s_p} needs > 12 MB of f32 score buffer even at tile_n=128; "
            f"use the einsum path (use_pallas=False) for Λ this large"
        )
    return tile_n


def fused_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, N, dk)
    k: jnp.ndarray,           # (h, S, dk)
    v: jnp.ndarray,           # (h, N, dk)
    slot_valid: jnp.ndarray,  # (S,) bool
    q_valid: jnp.ndarray,     # (N,) bool
    *,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # scalar int32
    tile_n: int = 1024,
) -> jnp.ndarray:
    """Fused (no p materialization) inverted sparse attention → (h, S, dk).

    Pads dk → ×128 lanes, S → ×128, N → ×tile_n; padding is mask-dead.
    """
    h, n, dk = q.shape
    s = k.shape[1]
    dk_p = _round_up(dk, 128)
    s_p = _round_up(s, 128)
    # Small bags should not pad up to a full tile (the model path calls
    # with the global default; MUSK-scale bags are <128 tokens).
    tile_n = _fit_tile_n(min(tile_n, _round_up(n, 128)), s_p)
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

    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    # The seed rides in a full (8, 128) VMEM tile rather than an SMEM scalar:
    # pallas_call's vmap batching rule cannot batch blocked SMEM operands on
    # TPU (eval/batched-bags paths vmap this op).
    seed = jnp.full((8, 128), jnp.reshape(dropout_seed, ()).astype(jnp.int32))

    scale = 1.0 / (dk ** 0.5)
    out = _sparse_attention_padded(
        seed, qp, kp, vp, kmask, qmask, scale, float(dropout_rate), tile_n
    )
    return out[:, :s, :dk]


def fused_packed_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, k*N, dk) — k bags packed on the row axis
    k: jnp.ndarray,           # (h, k*S, dk)
    v: jnp.ndarray,           # (h, k*N, dk)
    slot_valid: jnp.ndarray,  # (k*S,) bool
    q_valid: jnp.ndarray,     # (k*N,) bool
    segments: int,
    *,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
) -> jnp.ndarray:
    """Segment-aware fused kernel for packed bags → (h, k*S, dk).

    Bag s's queries attend only to bag s's slots (oracle:
    `sparse_attention.packed_inverted_sparse_attention`). Segments fold
    into the kernel's head grid axis head-major (hh = head·k + seg); each
    (head, segment) program reads its own (1, S) key mask and (1, TN) row
    mask via the index map — the block-diagonal structure costs zero extra
    FLOPs and nothing of size N×S ever leaves VMEM.
    """
    h, kn, dk = q.shape
    ks = k.shape[1]
    if kn % segments or ks % segments:
        raise ValueError(
            f"packed rows ({kn}) and slots ({ks}) must divide segments="
            f"{segments}"
        )
    n_seg, s_seg = kn // segments, ks // segments
    dk_p = _round_up(dk, 128)
    s_p = _round_up(s_seg, 128)
    tile_n = _fit_tile_n(min(tile_n, _round_up(n_seg, 128)), s_p)
    n_p = _round_up(n_seg, tile_n)

    def pad4(x, ll, cc):  # (h, k, L, dk) -> (h, k, ll, cc)
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, ll - x.shape[2]), (0, cc - x.shape[3]))
        )

    qp = pad4(q.reshape(h, segments, n_seg, dk), n_p, dk_p)
    kp = pad4(k.reshape(h, segments, s_seg, dk), s_p, dk_p)
    vp = pad4(v.reshape(h, segments, n_seg, dk), n_p, dk_p)
    qp = qp.reshape(h * segments, n_p, dk_p)
    kp = kp.reshape(h * segments, s_p, dk_p)
    vp = vp.reshape(h * segments, n_p, dk_p)
    # (segments, 8, ·) — the mask rides a replicated 8-row sublane tile
    # (see _mask_specs); the copies are a few KB and dead weight in VMEM.
    kmask = jnp.broadcast_to(
        jnp.pad(
            slot_valid.reshape(segments, s_seg).astype(jnp.float32),
            ((0, 0), (0, s_p - s_seg)),
        )[:, None, :],
        (segments, 8, s_p),
    )
    qmask = jnp.broadcast_to(
        jnp.pad(
            q_valid.reshape(segments, n_seg).astype(jnp.float32),
            ((0, 0), (0, n_p - n_seg)),
        )[:, None, :],
        (segments, 8, n_p),
    )

    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed = jnp.full((8, 128), jnp.reshape(dropout_seed, ()).astype(jnp.int32))

    scale = 1.0 / (dk ** 0.5)
    out = _sparse_attention_padded(
        seed, qp, kp, vp, kmask, qmask, scale, float(dropout_rate), tile_n,
        segments,
    )
    return out.reshape(h, segments, s_p, dk_p)[:, :, :s_seg, :dk].reshape(
        h, ks, dk
    )
