"""The Snuffy "inverted" sparse attention primitive.

Semantics (reference snuffy.py:160-168): with queries q_i for *all* N tokens
and keys k_j for the Λ selected tokens,

    p[i, j]  = softmax_j( q_i · k_j / √dk )          # rows sum to 1 over Λ
    out[j]   = Σ_i p[i, j] · v_i                      # transpose-matmul

i.e. every selected token j aggregates the values of all N tokens, weighted
by how strongly each token i attends *to* j. Note out rows are not convexly
normalized over i — this asymmetry is load-bearing and easy to get wrong.

Cost is O(N·Λ·dk) instead of O(N²·dk): the long-sequence mechanism that lets
a 3–10k-patch bag attend on a single chip. On TPU both matmuls are MXU-shaped
(N×dk @ dk×Λ, then Λ×N @ N×dk); this module is the XLA einsum path, used as
the correctness oracle for the fused Pallas kernel in
`snuffy_tpu.ops.pallas_attention`.

Padding contract: `slot_valid` kills dead key slots (−∞ before softmax) and
`q_valid` zeroes attention rows of padded queries so they contribute nothing
to any selected token's aggregate — exactly reproducing the unpadded
reference on the valid sub-bag.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Large finite negative, not -inf: a row whose key slots are ALL invalid
# (an all-padded dummy bag in batched mode) must softmax to a finite
# uniform row, not 0/0=NaN — the NaN would survive the q_valid zeroing
# (0·NaN=NaN) and poison value-projection grads through the p·cot einsum
# VJP even though the forward output is dropped. exp(-1e30 − max) is still
# exactly 0 for every masked slot of a real row.
NEG_INF = -1e30


def inverted_sparse_attention(
    q: jnp.ndarray,           # (h, N, dk)
    k: jnp.ndarray,           # (h, S, dk)
    v: jnp.ndarray,           # (h, N, dk)
    slot_valid: jnp.ndarray,  # (S,) bool — which key slots are live
    q_valid: jnp.ndarray,     # (N,) bool — which query/value rows are live
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_probs: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (out (h, S, dk), p_attn (h, N, S) or None)."""
    dk = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dk, dtype=jnp.float32))
    scores = jnp.einsum(
        "hnd,hsd->hns", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(slot_valid[None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    p = p * q_valid[None, :, None].astype(p.dtype)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("hns,hnd->hsd", p, v, preferred_element_type=jnp.float32)
    out = out.astype(v.dtype)
    return out, (p if return_probs else None)


def packed_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, k*N, dk) — k bags packed on the row axis
    k: jnp.ndarray,           # (h, k*S, dk)
    v: jnp.ndarray,           # (h, k*N, dk)
    slot_valid: jnp.ndarray,  # (k*S,) bool
    q_valid: jnp.ndarray,     # (k*N,) bool
    segments: int,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-segment inverted sparse attention over packed bags → (h, k*S, dk).

    Bag s's queries attend only to bag s's selected slots — mathematically
    identical to calling `inverted_sparse_attention` once per bag. Computed
    as a batched einsum over the segment axis (block-diagonal structure at
    zero extra FLOPs); the XLA oracle for the segment-aware Pallas kernel.
    """
    h, kn, dk = q.shape
    ks = k.shape[1]
    n, s = kn // segments, ks // segments
    qb = q.reshape(h, segments, n, dk)
    kb = k.reshape(h, segments, s, dk)
    vb = v.reshape(h, segments, n, dk)
    sv = slot_valid.reshape(segments, s)
    qv = q_valid.reshape(segments, n)

    scale = 1.0 / jnp.sqrt(jnp.asarray(dk, dtype=jnp.float32))
    scores = jnp.einsum(
        "hknd,hksd->hkns", qb, kb, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(sv[None, :, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    p = p * qv[None, :, :, None].astype(p.dtype)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "hkns,hknd->hksd", p, vb, preferred_element_type=jnp.float32
    )
    return out.reshape(h, ks, dk).astype(v.dtype)
