"""Sequence-parallel inverted sparse attention over the `sp` mesh axis.

For bags too long for one chip's HBM (SURVEY.md §5 "long-context handling":
the stretch goal beyond the reference's single-GPU Λ-sparse design), the N
(token) axis shards across `sp`. The math decomposes exactly:

    p[i, :] = softmax_j(q_i · k_j / √dk)   — rows are independent over i,
                                              so each shard softmaxes its
                                              own rows locally;
    out[j]  = Σ_i p[i, j] · v_i            — a sum over i, so the partial
                                              (Λ, dk) products psum over sp.

One `shard_map` with a single `psum` per call; the Λ keys/slots replicate
(Λ ≤ 1024 ≪ N). Inside each shard the fused Pallas kernel does the local
work, so the ICI collective is the only addition over the single-chip path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sp_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, N, dk) — N divisible by mesh['sp']
    k: jnp.ndarray,           # (h, S, dk)
    v: jnp.ndarray,           # (h, N, dk)
    slot_valid: jnp.ndarray,  # (S,)
    q_valid: jnp.ndarray,     # (N,)
    mesh: Mesh,
    *,
    use_pallas: bool = True,
    tile_n: int = 512,
) -> jnp.ndarray:
    """→ (h, S, dk), identical to the single-device op."""

    def local(q_l, k_l, v_l, sv_l, qv_l):
        if use_pallas:
            from snuffy_tpu.ops.pallas_attention import (
                fused_inverted_sparse_attention,
            )

            partial_out = fused_inverted_sparse_attention(
                q_l, k_l, v_l, sv_l, qv_l, tile_n=min(tile_n, q_l.shape[1])
            )
        else:
            from snuffy_tpu.ops.sparse_attention import (
                inverted_sparse_attention,
            )

            partial_out, _ = inverted_sparse_attention(
                q_l, k_l, v_l, sv_l, qv_l, return_probs=False
            )
        return jax.lax.psum(partial_out, "sp")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, "sp", None),   # q rows sharded
            P(None, None, None),   # k replicated
            P(None, "sp", None),   # v rows sharded
            P(None),               # slot_valid replicated
            P("sp"),               # q_valid rows sharded
        ),
        out_specs=P(None, None, None),
        # Pallas out_shapes carry no vma info; skip the varying-axes check.
        check_vma=False,
    )(q, k, v, slot_valid, q_valid)
