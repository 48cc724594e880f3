"""Measure per-iteration scan overhead vs genuine op cost on the real chip.

Distinguishes 'every scan iteration costs ~1.2 ms no matter what' (backend
floor) from 'top_k really costs 1.2 ms' by scaling the work inside the body.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def t(body, carry0, label):
    @jax.jit
    def run(carry):
        carry, outs = jax.lax.scan(body, carry, None, length=ITERS)
        return outs

    outs = run(carry0)
    float(np.asarray(outs).sum())
    t0 = time.perf_counter()
    outs = run(carry0)
    float(np.asarray(outs).sum())
    dt = time.perf_counter() - t0
    print(f"{label:32s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def main():
    n = 10240
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)

    def trivial(carry, _):
        x, acc = carry
        s = jnp.sum(x) * 1e-6
        return (x + s * 1e-30, acc + s), s
    t(trivial, (x0, 0.0), "trivial body (sum only)")

    def one_topk(carry, _):
        x, acc = carry
        v, i = jax.lax.top_k(x, 256)
        s = jnp.sum(v) + jnp.sum(i).astype(jnp.float32)
        return (x + s * 1e-30, acc + s), s
    t(one_topk, (x0, 0.0), "1x top_k(10240, 256)")

    def four_topk(carry, _):
        x, acc = carry
        s = 0.0
        for j in range(4):
            v, i = jax.lax.top_k(x + j * 1e-30, 256)
            s = s + jnp.sum(v) + jnp.sum(i).astype(jnp.float32)
        return (x + s * 1e-30, acc + s), s
    t(four_topk, (x0, 0.0), "4x top_k(10240, 256)")

    w = jnp.asarray(rng.standard_normal((384, 1536)) * 0.02, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((n, 384)), jnp.bfloat16)

    def one_mm(carry, _):
        ww, acc = carry
        s = jnp.sum((a @ ww).astype(jnp.float32))
        return (ww + s.astype(jnp.bfloat16) * 1e-30, acc + s), s
    t(one_mm, (w, 0.0), "1x matmul 10240x384x1536 bf16")

    def eight_mm(carry, _):
        ww, acc = carry
        s = 0.0
        for j in range(8):
            s = s + jnp.sum((a @ (ww + j * 1e-30)).astype(jnp.float32))
        return (ww + s.astype(jnp.bfloat16) * 1e-30, acc + s), s
    t(eight_mm, (w, 0.0), "8x matmul 10240x384x1536 bf16")


if __name__ == "__main__":
    main()
