"""Sequence-parallel ops over the `sp` mesh axis: the three places the
(N, d) residual stream would otherwise be all-gathered.

For bags too long for one chip's HBM (SURVEY.md §5 "long-context handling":
the stretch goal beyond the reference's single-GPU Λ-sparse design), the N
(token) axis shards across `sp`. GSPMD handles everything elementwise over N
(LayerNorm, FFN, residual adds) without communication, but three ops touch
rows by *global index* and would make it materialize the full stream:

  1. the selected-token gather  (reference snuffy.py:131,145)
  2. the inverted sparse attention (reference snuffy.py:148,160-168)
  3. the selected-row scatter   (reference snuffy.py:152-155)

Each gets an explicit `shard_map` here. The attention math decomposes
exactly:

    p[i, :] = softmax_j(q_i · k_j / √dk)   — rows are independent over i,
                                              so each shard softmaxes its
                                              own rows locally;
    out[j]  = Σ_i p[i, j] · v_i            — a sum over i, so the partial
                                              (Λ, dk) products psum over sp.

All collectives move (S, d)-sized tensors (S = Λ ≤ ~1k ≪ N); nothing
N-proportional ever crosses ICI, which is what makes the per-device memory
N/sp real. The head axis optionally shards over `tp` so a dp × sp × tp mesh
keeps Megatron head parallelism through the manual region.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sp_size(mesh: Optional[Mesh]) -> int:
    """Sequence-parallel degree of a mesh (1 if absent)."""
    if mesh is None or "sp" not in mesh.axis_names:
        return 1
    return mesh.shape["sp"]


def _head_axis(mesh: Mesh, num_heads: int):
    """Shard the head axis over tp when the mesh has one and it divides h."""
    if "tp" in mesh.axis_names and mesh.shape["tp"] > 1 \
            and num_heads % mesh.shape["tp"] == 0:
        return "tp"
    return None


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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """→ (h, S, dk), identical to the single-device op.

    Attention-probability dropout (reference snuffy.py:167/181) is drawn
    per shard from `dropout_rng` folded with the shard's mesh position, so
    masks are i.i.d. across the sharded rows — distributionally identical
    to the single-device draw (not bitwise; parity tests run deterministic).
    """
    h_ax = _head_axis(mesh, q.shape[0])
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    # The seed crosses the shard_map boundary as a plain int32 operand
    # (a closed-over key array would not batch correctly under the
    # spmd_axis_name vmap of the batched-bags trainer).
    seed = (
        jax.random.randint(dropout_rng, (), 0, 2**30 - 1, dtype=jnp.int32)
        if use_dropout
        else jnp.int32(0)
    )

    def local(q_l, k_l, v_l, sv_l, qv_l, seed_l):
        if use_dropout:
            seed_l = seed_l + jax.lax.axis_index("sp") * jnp.int32(7919)
            if h_ax is not None:
                seed_l = seed_l + jax.lax.axis_index(h_ax) * jnp.int32(104729)
        if use_pallas:
            from snuffy_tpu.ops.pallas_attention import (
                fused_inverted_sparse_attention,
            )

            kwargs = {}
            if use_dropout:
                kwargs = dict(dropout_rate=dropout_rate, dropout_seed=seed_l)
            partial_out = fused_inverted_sparse_attention(
                q_l, k_l, v_l, sv_l, qv_l,
                tile_n=min(tile_n, q_l.shape[1]), **kwargs
            )
        else:
            from snuffy_tpu.ops.sparse_attention import (
                inverted_sparse_attention,
            )

            partial_out, _ = inverted_sparse_attention(
                q_l, k_l, v_l, sv_l, qv_l,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_rng=(
                    jax.random.PRNGKey(seed_l) if use_dropout else None
                ),
                return_probs=False,
            )
        return jax.lax.psum(partial_out, "sp")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(h_ax, "sp", None),   # q heads over tp, rows over sp
            P(h_ax, None, None),   # k slots replicated
            P(h_ax, "sp", None),   # v rows sharded
            P(None),               # slot_valid replicated
            P("sp"),               # q_valid rows sharded
            P(),                   # dropout seed (replicated scalar)
        ),
        out_specs=P(h_ax, None, None),
        # Pallas out_shapes carry no vma info; skip the varying-axes check.
        check_vma=False,
    )(q, k, v, slot_valid, q_valid, seed)


def sp_gather_rows(
    x: jnp.ndarray,        # (N, d) — N sharded over sp
    indices: jnp.ndarray,  # (S,) int32 global row ids, replicated
    mesh: Mesh,
) -> jnp.ndarray:
    """Replicated (S, d) gather of globally-indexed rows from the sharded
    stream — the jit-safe, N-local equivalent of `x[selected_indices]`
    (reference snuffy.py:131,145). The owner shard contributes each row;
    the psum moves only (S, d) per device."""

    def local(x_l, idx_l):
        n_loc = x_l.shape[0]
        off = jax.lax.axis_index("sp") * n_loc
        li = idx_l - off
        owned = (li >= 0) & (li < n_loc)
        rows = jnp.take(x_l, jnp.clip(li, 0, n_loc - 1), axis=0)
        rows = jnp.where(owned[:, None], rows, jnp.zeros((), x_l.dtype))
        return jax.lax.psum(rows, "sp")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("sp", None), P(None)),
        out_specs=P(None, None),
        check_vma=False,
    )(x, indices)


def sp_scatter_rows(
    x: jnp.ndarray,           # (N, d) — N sharded over sp
    indices: jnp.ndarray,     # (S,) int32 global row ids, replicated
    slot_valid: jnp.ndarray,  # (S,) bool, replicated
    rows: jnp.ndarray,        # (S, d) replacement rows, replicated
    mesh: Mesh,
) -> jnp.ndarray:
    """Sharded scatter-set of globally-indexed rows: each shard writes only
    the rows it owns (equiv. of `y[:, selected_indices, :] = x_big_lambda`,
    reference snuffy.py:152-155). No collective at all — invalid or
    foreign-owned slots are routed out of bounds and dropped."""

    def local(x_l, idx_l, sv_l, rows_l):
        n_loc = x_l.shape[0]
        off = jax.lax.axis_index("sp") * n_loc
        li = idx_l - off
        keep = (li >= 0) & (li < n_loc) & sv_l
        li = jnp.where(keep, li, n_loc)
        return x_l.at[li].set(rows_l.astype(x_l.dtype), mode="drop")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("sp", None), P(None), P(None), P(None, None)),
        out_specs=P("sp", None),
        check_vma=False,
    )(x, indices, slot_valid, rows)
