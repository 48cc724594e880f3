"""Locate the batched-bags penalty (VERDICT r2 weak-7 / next-5).

Serial scan trains at ~318 bags/s, vmapped batched mode at ~131 — a
~4.5 ms/bag gap, ~2.2 ms per encoder layer. Candidates: the vmapped
selection (top_k + gumbel), the vmapped row gather, the vmapped
scatter-set. This times each in isolation at the bench operating point
(B=8, N=10240, d=384, S=1024) against MXU-friendly one-hot-matmul
formulations that avoid batched gather/scatter ops entirely.

Timings fence with a host transfer (relay block_until_ready caveat,
CLAUDE.md). Run on the real chip: python tools/profile_batched_overhead.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

B, N, D, S = 8, 10240, 384, 1024
ITERS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[0], out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
    scores = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    valid = jnp.asarray(np.arange(N)[None, :] < 10000).repeat(B, 0)
    idx = jnp.asarray(
        np.stack([rng.choice(N, S, replace=False) for _ in range(B)]),
        jnp.int32,
    )
    sv = jnp.asarray(np.arange(S)[None, :] < S - 7).repeat(B, 0)
    new_rows = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    # --- selection -------------------------------------------------------
    @jax.jit
    def sel_vmap(scores, valid, keys):
        from snuffy_tpu.ops.selection import binary_lambda_selection

        return jax.vmap(
            lambda s, v, k: binary_lambda_selection(k, s, v, S // 2, S // 2)
        )(scores, valid, keys)

    timeit("selection: vmapped binary_lambda", sel_vmap, scores, valid, keys)

    # --- gather ----------------------------------------------------------
    @jax.jit
    def gather_vmap(x, idx):
        return jax.vmap(lambda xb, ib: jnp.take(xb, ib, axis=0))(x, idx)

    @jax.jit
    def gather_onehot(x, idx):
        e = jax.nn.one_hot(idx, N, dtype=x.dtype)       # (B, S, N)
        return jnp.einsum("bsn,bnd->bsd", e, x)

    @jax.jit
    def gather_flat(x, idx):
        flat = x.reshape(B * N, D)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        return jnp.take(flat, (idx + off).reshape(-1), axis=0).reshape(B, S, D)

    timeit("gather: vmapped take", gather_vmap, x, idx)
    timeit("gather: one-hot matmul", gather_onehot, x, idx)
    timeit("gather: flat-index take", gather_flat, x, idx)

    # --- scatter ---------------------------------------------------------
    @jax.jit
    def scatter_vmap(x, idx, sv, rows):
        def one(xb, ib, svb, rb):
            si = jnp.where(svb, ib, jnp.int32(N))
            return xb.at[si].set(rb, mode="drop")

        return jax.vmap(one)(x, idx, sv, rows)

    @jax.jit
    def scatter_onehot(x, idx, sv, rows):
        e = jax.nn.one_hot(
            jnp.where(sv, idx, jnp.int32(N)), N, dtype=x.dtype
        )                                                # (B, S, N)
        hit = jnp.einsum("bsn->bn", e)[..., None]        # 0/1 per row
        repl = jnp.einsum("bsn,bsd->bnd", e, rows)
        return x * (1 - hit) + repl

    @jax.jit
    def scatter_flat(x, idx, sv, rows):
        flat = x.reshape(B * N, D)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None]
        si = jnp.where(sv, idx + off, jnp.int32(B * N))
        return flat.at[si.reshape(-1)].set(
            rows.reshape(B * S, D), mode="drop"
        ).reshape(B, N, D)

    timeit("scatter: vmapped at.set", scatter_vmap, x, idx, sv, new_rows)
    timeit("scatter: one-hot matmul blend", scatter_onehot, x, idx, sv,
           new_rows)
    timeit("scatter: flat-index at.set", scatter_flat, x, idx, sv, new_rows)

    # --- reference: one serial-bag gather+scatter for scale --------------
    @jax.jit
    def gather_serial(x, idx):
        return jnp.take(x[0], idx[0], axis=0)

    @jax.jit
    def scatter_serial(x, idx, sv, rows):
        si = jnp.where(sv[0], idx[0], jnp.int32(N))
        return x[0].at[si].set(rows[0], mode="drop")

    timeit("gather: single bag (serial path)", gather_serial, x, idx)
    timeit("scatter: single bag (serial path)", scatter_serial, x, idx, sv,
           new_rows)


if __name__ == "__main__":
    main()
