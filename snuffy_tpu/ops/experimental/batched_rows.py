"""Batch-aware row gather/scatter for the encoder's Λ-selection hot path.

STATUS — measured, NOT wired into the model. Standalone probes showed the
vmapped `at.set` at 284 ms vs 56 ms for the same update phrased as ONE
flat-index scatter over the (B·N, d) view
(tools/profile_batched_overhead.py, B=8, N=10240, S=1024, d=384, v5e),
which suggested these ops would close the batched-bags penalty. They
don't: an in-model A/B (naive jnp ops vs these, identical full batched
train step) measured 68.8 vs 68.3 ms — ZERO change. Two lessons recorded
for the next profile (tools/profile_batched_step.py):
  * standalone scatter probes on the relay backend are dispatch-floor
    artifacts — in the full program XLA schedules the batched scatter off
    the critical path;
  * the real batched-mode gap (1.43×: 212 vs 303 bags/s, pipelined
    dispatch) is vmap-vs-scan BACKWARD fusion, and the historical "2.4×"
    (131 vs 318) was per-step host syncs paying ~25 ms relay RTT each.
Kept as correct, tested primitives (tests/test_batched_rows.py) for
hardware/runtime combinations where batched scatters do dominate.

The reference updates the selected rows of the residual stream in place
(`y[:, selected_indices, :] = x_big_lambda`, reference snuffy.py:152-155)
and gathers the selected tokens (`snuffy_multiclass.py:107-109`). The jit
equivalents — `jnp.take` and `x.at[idx].set(..., mode='drop')` — lower to
batched scatters under `jax.vmap` (the batched-bags training mode). This
module rephrases all three scatter sites flat without touching the
single-bag path:

  * `jax.custom_batching.custom_vmap` gives each op a batched rule that
    offsets indices per bag and runs a single flat scatter/gather over the
    collapsed (B·N, d) view — the formulation XLA tiles well;
  * `jax.custom_vjp` pins the backward pass to the same flat formulations
    (gather bwd = flat scatter-add, scatter bwd = flat gather + a d=1 flat
    hit-mask scatter), so grad(vmap(train_step)) never builds a batched
    scatter.

Semantics (single bag):
    gather_rows(x, idx)          == jnp.take(x, idx, axis=0)
    scatter_set_rows(x, si, rows) == x.at[si].set(rows, mode='drop')
where `si` entries == n (or >= n) are dropped — the caller routes invalid
selection slots to the sentinel exactly as before. Valid indices are
unique by construction (selection samples without replacement), matching
the reference's in-place write.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching


def _flatten_indices(si: jnp.ndarray, n: int, b: int) -> jnp.ndarray:
    """Per-bag indices (B, S) -> flat indices into the (B·N, ·) view.

    In-bag sentinel entries (>= n) map to the flat sentinel b·n so
    mode='drop' keeps dropping them.
    """
    off = (jnp.arange(b, dtype=si.dtype) * n)[:, None]
    return jnp.where(si >= n, jnp.int32(b * n), si + off)


def _bcast(operand, batched, axis_size):
    """Broadcast an unbatched operand to a leading batch axis."""
    if batched:
        return operand
    return jnp.broadcast_to(operand[None], (axis_size,) + operand.shape)


# --------------------------------------------------------------- primitives


@custom_batching.custom_vmap
def _scatter_set(x, si, rows):
    return x.at[si].set(rows, mode="drop")


@_scatter_set.def_vmap
def _scatter_set_vmap(axis_size, in_batched, x, si, rows):
    x = _bcast(x, in_batched[0], axis_size)
    si = _bcast(si, in_batched[1], axis_size)
    rows = _bcast(rows, in_batched[2], axis_size)
    b, n = x.shape[0], x.shape[1]
    s = si.shape[1]
    flat = x.reshape((b * n,) + x.shape[2:])
    fsi = _flatten_indices(si, n, b)
    out = flat.at[fsi.reshape(-1)].set(
        rows.reshape((b * s,) + rows.shape[2:]), mode="drop"
    )
    return out.reshape(x.shape), True


@custom_batching.custom_vmap
def _scatter_add(x, si, rows):
    return x.at[si].add(rows, mode="drop")


@_scatter_add.def_vmap
def _scatter_add_vmap(axis_size, in_batched, x, si, rows):
    x = _bcast(x, in_batched[0], axis_size)
    si = _bcast(si, in_batched[1], axis_size)
    rows = _bcast(rows, in_batched[2], axis_size)
    b, n = x.shape[0], x.shape[1]
    s = si.shape[1]
    flat = x.reshape((b * n,) + x.shape[2:])
    fsi = _flatten_indices(si, n, b)
    out = flat.at[fsi.reshape(-1)].add(
        rows.reshape((b * s,) + rows.shape[2:]), mode="drop"
    )
    return out.reshape(x.shape), True


def _hit_mask(si: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """(N,) 1.0 where a row is written by `si`, else 0.0 — routed through
    the flat batched rule so vmap never sees a batched scatter."""
    zeros = jnp.zeros((n, 1), dtype)
    ones = jnp.ones((si.shape[0], 1), dtype)
    return _scatter_set(zeros, si, ones)[:, 0]


# ------------------------------------------------------------- public ops


@jax.custom_vjp
def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """jnp.take(x, idx, axis=0) with a flat-under-vmap scatter-add VJP."""
    return jnp.take(x, idx, axis=0)


def _gather_fwd(x, idx):
    return jnp.take(x, idx, axis=0), (idx, x.shape[0])


def _gather_bwd(res, g):
    idx, n = res
    gx = _scatter_add(jnp.zeros((n,) + g.shape[1:], g.dtype), idx, g)
    return gx, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def scatter_set_rows(
    x: jnp.ndarray, si: jnp.ndarray, rows: jnp.ndarray
) -> jnp.ndarray:
    """x.at[si].set(rows, mode='drop') (si >= len(x) dropped), flat under
    vmap in both forward and backward."""
    return _scatter_set(x, si, rows)


def _scatter_fwd(x, si, rows):
    return _scatter_set(x, si, rows), (si, x.shape[0])


def _scatter_bwd(res, g):
    si, n = res
    live = (si < n)[:, None].astype(g.dtype)
    grows = jnp.take(g, jnp.minimum(si, n - 1), axis=0) * live
    gx = g * (1.0 - _hit_mask(si, n, g.dtype))[:, None]
    return gx, None, grows


scatter_set_rows.defvjp(_scatter_fwd, _scatter_bwd)
