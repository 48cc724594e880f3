"""Ablate WHERE the vmapped backward loses to the serial scan
(tools/profile_batched_step.py measured the full step at ~1.43x per bag;
this isolates the component). Each variant is a cut-down per-bag function
run both ways — vmapped-with-one-grad and scanned-with-per-bag-grads —
at the bench operating point (B=8, N=10240, d=384, Λ=1024 post-pad).

All outputs are scalars (grads folded in) so nothing times the host link;
every timing fences with a host fetch. Run on the real chip.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

B, N, NV, D, LAM = 8, 10240, 10000, 384, 512
ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def gsum(grads):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda g: jnp.sum(g.astype(jnp.float32)),
                               grads),
    )


def both_ways(tag, per_bag, params, feats, keys):
    """per_bag(params, f, k) -> scalar loss. Times vmap-grad vs scan-grad."""

    @jax.jit
    def vmapped(params, feats, keys):
        def mean_loss(p):
            return jax.vmap(lambda f, k: per_bag(p, f, k))(feats, keys).mean()

        val, g = jax.value_and_grad(mean_loss)(params)
        return val + 0.0 * gsum(g)

    @jax.jit
    def scanned(params, feats, keys):
        def body(carry, xs):
            f, k = xs
            val, g = jax.value_and_grad(
                lambda p: per_bag(p, f, k)
            )(carry)
            carry = jax.tree_util.tree_map(lambda p, u: p - 1e-9 * u,
                                           carry, g)
            return carry, val

        _, vals = jax.lax.scan(body, params, (feats, keys))
        return vals.sum()

    tv = timeit(f"{tag}: vmap fwd+bwd", vmapped, params, feats, keys)
    ts = timeit(f"{tag}: scan fwd+bwd", scanned, params, feats, keys)
    print(f"{tag}: vmap/scan = {tv / ts:.2f}x", flush=True)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    k0 = jax.random.PRNGKey(1)
    bf = jnp.bfloat16

    # --- 1. FFN only: LN + d->4d->d GeLU residual, mean-pool head -------
    p_ffn = {
        "w1": jax.random.normal(k0, (D, 4 * D), jnp.float32) * 0.02,
        "w2": jax.random.normal(k0, (4 * D, D), jnp.float32) * 0.02,
        "head": jax.random.normal(k0, (D, 1), jnp.float32) * 0.02,
    }

    def ffn_bag(p, f, k):
        h = f.astype(bf)
        y = jax.nn.gelu(h @ p["w1"].astype(bf)) @ p["w2"].astype(bf)
        h = (h + y).astype(jnp.float32)
        return (h.mean(0) @ p["head"])[0]

    both_ways("ffn (2 GEMMs + gelu)", ffn_bag, p_ffn, feats, keys)

    # --- 2. selection only: instance logits -> top-k + gumbel ----------
    p_sel = {"wi": jax.random.normal(k0, (D, 1), jnp.float32) * 0.02}

    def sel_bag(p, f, k):
        c = (f @ p["wi"])[:, 0]
        top = jax.lax.top_k(c, LAM)[1]
        gmb = jax.random.gumbel(k, (N,))
        rnd = jax.lax.top_k(gmb, LAM)[1]
        idx = jnp.concatenate([top, rnd])
        return (f[idx] ** 2).mean()

    both_ways("selection (top_k + gumbel + gather)", sel_bag, p_sel,
              feats, keys)

    # --- 3. attention only: FIXED indices, Pallas inverted kernel + scatter
    from snuffy_tpu.ops.pallas_attention import (
        fused_inverted_sparse_attention,
    )

    p_att = {
        "wq": jax.random.normal(k0, (D, D), jnp.float32) * 0.02,
        "wk": jax.random.normal(k0, (D, D), jnp.float32) * 0.02,
        "wv": jax.random.normal(k0, (D, D), jnp.float32) * 0.02,
        "head": jax.random.normal(k0, (D, 1), jnp.float32) * 0.02,
    }
    S = 2 * LAM
    sel_idx = jnp.arange(S, dtype=jnp.int32)   # static Λ block
    mask = jnp.asarray(np.arange(N) < NV)
    slot_ok = jnp.ones((S,), bool)
    h4, dk = 4, D // 4

    def att_bag(p, f, k):
        h = f.astype(bf)
        q = h @ p["wq"].astype(bf)               # (N, D) all rows
        kk = (h @ p["wk"].astype(bf))[sel_idx]   # (S, D) selected slots
        v = h @ p["wv"].astype(bf)
        out = fused_inverted_sparse_attention(
            q.reshape(N, h4, dk).swapaxes(0, 1),
            kk.reshape(S, h4, dk).swapaxes(0, 1),
            v.reshape(N, h4, dk).swapaxes(0, 1),
            slot_ok, mask,
            dropout_rate=0.0,
            dropout_seed=jax.random.randint(k, (), 0, 2**31 - 1),
        )                                         # (h4, S, dk)
        upd = out.swapaxes(0, 1).reshape(S, D).astype(jnp.float32)
        y = f.at[sel_idx].set(upd)
        return (y.mean(0) @ p["head"])[0]

    both_ways("attention (pallas kernel + scatter)", att_bag, p_att,
              feats, keys)


if __name__ == "__main__":
    main()
