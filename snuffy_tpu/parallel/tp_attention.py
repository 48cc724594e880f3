"""Tensor-parallel wrapper for the fused Pallas sparse attention.

`pallas_call` has no GSPMD partitioning rule, so left on tp-auto axes XLA
replicates the kernel — an all-gather of every bag's padded (h, N, Λ)
probs residual across tp, each layer, fwd and bwd (the failure mode
tests/test_collective_audit.py pins). Until round 4 tp meshes therefore
fell back to einsum attention; this wrapper keeps the fused kernel
(VERDICT r4 item 5) by exploiting that the inverted sparse attention is
embarrassingly parallel over heads:

  * Megatron column-parallel wq/wk/wv (parallel/sharded_train.py _TP_RULES,
    P(None, 'tp')) shard the feature axis in contiguous chunks, and
    split_heads maps chunk i exactly onto heads [i·h/tp, (i+1)·h/tp) —
    the head axis of (h, N, dk) is ALREADY tp-sharded, no resharding;
  * each head's softmax/accumulate touches only its own rows, so the
    shard_map body is just the single-device kernel on h/tp local heads,
    with ZERO collectives inside;
  * the (h, S, dk) output stays head-sharded, which is exactly the
    row-parallel layout wo (P('tp', None)) consumes — its partial-sum
    all-reduce is the same activation-bounded collective the einsum path
    paid, so the audit's traffic bounds are unchanged.

Dropout stays BIT-EXACT with the unsharded kernel: the in-kernel hash
keys on (seed + local_head·C3); offsetting each shard's seed by
(first_global_head·C3) — int32 wraparound arithmetic, same as the kernel
— makes every local hash equal its global-head counterpart.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from snuffy_tpu.ops.pallas_attention import _C3, fused_inverted_sparse_attention


def tp_size(mesh: Optional[Mesh]) -> int:
    return int(mesh.shape.get("tp", 1)) if mesh is not None else 1


def tp_fused_inverted_sparse_attention(
    q: jnp.ndarray,           # (h, N, dk) — h sharded over tp
    k: jnp.ndarray,           # (h, S, dk)
    v: jnp.ndarray,           # (h, N, dk)
    slot_valid: jnp.ndarray,  # (S,) bool, replicated
    q_valid: jnp.ndarray,     # (N,) bool, replicated
    mesh: Mesh,
    *,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
) -> jnp.ndarray:
    h = q.shape[0]
    tp = tp_size(mesh)
    if h % tp:
        raise ValueError(f"num_heads {h} not divisible by tp={tp}")
    h_local = h // tp
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)

    # Per-shard seed offsets ⇒ shard i's local head j hashes as global head
    # (i·h_local + j): bit-identical dropout to the unsharded kernel. The
    # (tp,) array is built OUTSIDE and sharded over tp rather than derived
    # from axis_index inside — lax.axis_index does not lower inside a
    # nested manual region (the dp-manual shard_map wraps this one).
    seeds = (dropout_seed.astype(jnp.int32)
             + jnp.arange(tp, dtype=jnp.int32)
             * jnp.int32(h_local) * jnp.int32(_C3))

    def local(qh, kh, vh, sv, qv, seed_l):
        return fused_inverted_sparse_attention(
            qh, kh, vh, sv, qv,
            dropout_rate=dropout_rate, dropout_seed=seed_l[0], tile_n=tile_n,
        )

    # Inside an already-manual region (the dp-manual shard_map of
    # parallel/sharded_train.py) a nested shard_map must be built against
    # the tracing context's ABSTRACT mesh — passing the concrete Mesh
    # raises "context mesh should match the mesh passed to shard_map".
    ctx = jax.sharding.get_abstract_mesh()
    use_mesh = ctx if "tp" in (ctx.axis_names or ()) else mesh

    spec = P("tp", None, None)
    return jax.shard_map(
        local,
        mesh=use_mesh,
        in_specs=(spec, spec, spec, P(None), P(None), P("tp")),
        out_specs=spec,
        axis_names={"tp"},
        check_vma=False,
    )(q, k, v, slot_valid, q_valid, seeds)
