"""Micro-profiler for the MIL training step components on the current
backend. Uses lax.scan to amortize dispatch latency (the axon relay costs
~30 ms per call) and generates data on device (host transfers through the
relay are slow). Prints ms/iter for: fused attention kernel (fwd, fwd+bwd),
Λ-selection, FFN, gather+scatter, layernorm.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_PAD, D, LAM, HEADS = 16384, 384, 512, 4
ITERS = 32


def scan_time(make_x, body, name):
    def scanned(key):
        xs = jax.random.split(key, ITERS)

        def f(c, k):
            return c + body(make_x(k)), 0

        total, _ = jax.lax.scan(f, 0.0, xs)
        return total

    fn = jax.jit(scanned)
    float(np.asarray(fn(jax.random.PRNGKey(0))))  # compile+fence
    t0 = time.perf_counter()
    float(np.asarray(fn(jax.random.PRNGKey(1))))
    print(f"{name}: {(time.perf_counter() - t0) / ITERS * 1e3:.3f} ms/iter",
          flush=True)


def main():
    from snuffy_tpu.ops.pallas_attention import fused_inverted_sparse_attention
    from snuffy_tpu.ops.selection import binary_lambda_selection

    sv = jnp.ones((LAM,), bool)
    qv = jnp.ones((N_PAD,), bool)
    mask = jnp.ones((N_PAD,), bool)

    def mk_q(k):
        return jax.random.normal(k, (HEADS, N_PAD, D // HEADS), jnp.bfloat16)

    scan_time(
        mk_q,
        lambda q: jnp.sum(
            fused_inverted_sparse_attention(q, q[:, :LAM], q, sv, qv
                                            ).astype(jnp.float32)
        ),
        "kernel fwd",
    )

    def kern_loss(q):
        out = fused_inverted_sparse_attention(q, q[:, :LAM], q, sv, qv)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    scan_time(
        mk_q,
        lambda q: jnp.sum(jax.grad(kern_loss)(q).astype(jnp.float32)),
        "kernel fwd+bwd",
    )

    scan_time(
        lambda k: (jax.random.normal(k, (N_PAD,)), k),
        lambda x: jnp.sum(
            binary_lambda_selection(x[1], x[0], mask, 256, 256).indices
        ),
        "selection (topk+gumbel)",
    )

    w1 = 0.02 * jax.random.normal(jax.random.PRNGKey(2), (D, 4 * D),
                                  jnp.bfloat16)
    w2 = 0.02 * jax.random.normal(jax.random.PRNGKey(3), (4 * D, D),
                                  jnp.bfloat16)

    def ffn_loss(x):
        h = jax.nn.gelu((x.astype(jnp.bfloat16) @ w1).astype(jnp.float32))
        y = (h.astype(jnp.bfloat16) @ w2).astype(jnp.float32)
        return jnp.sum(y ** 2)

    scan_time(lambda k: jax.random.normal(k, (N_PAD, D)),
              lambda x: jnp.sum(jax.grad(ffn_loss)(x)), "FFN fwd+bwd")

    def scat(x):
        idx = jnp.arange(LAM)
        sel = jnp.take(x, idx, axis=0)
        return jnp.sum(x.at[idx].set(sel * 2.0, mode="drop"))

    scan_time(lambda k: jax.random.normal(k, (N_PAD, D)), scat,
              "gather+scatter")

    def ln(x):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return jnp.sum((x - mu) * jax.lax.rsqrt(var + 1e-6))

    scan_time(lambda k: jax.random.normal(k, (N_PAD, D)), ln, "layernorm")


if __name__ == "__main__":
    main()
