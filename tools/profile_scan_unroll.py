"""Is there a fixed per-iteration cost in lax.scan on this backend, and does
unroll reclaim it? Times a trivial body and a real-ish body at several scan
lengths and unroll factors."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(body, carry0, length, unroll, label):
    @jax.jit
    def run(carry):
        carry, outs = jax.lax.scan(body, carry, None, length=length,
                                   unroll=unroll)
        return outs

    outs = run(carry0)
    float(np.asarray(outs).sum())
    t0 = time.perf_counter()
    outs = run(carry0)
    float(np.asarray(outs).sum())
    dt = time.perf_counter() - t0
    print(f"{label:34s} len={length:4d} unroll={unroll:2d} "
          f"{dt / length * 1e3:8.4f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(10240), jnp.float32)

    def trivial(carry, _):
        x, acc = carry
        s = jnp.sum(x) * 1e-6
        return (x + s * 1e-30, acc + s), s

    for length in (50, 200):
        for unroll in (1, 4):
            t(trivial, (x0, 0.0), length, unroll, "trivial")

    w = jnp.asarray(rng.standard_normal((384, 1536)) * 0.02, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((10240, 384)), jnp.bfloat16)

    def mm(carry, _):
        ww, acc = carry
        s = jnp.sum((a @ ww).astype(jnp.float32))
        return (ww + s.astype(jnp.bfloat16) * 1e-30, acc + s), s

    for unroll in (1, 2, 4):
        t(mm, (w, 0.0), 100, unroll, "1x matmul")


if __name__ == "__main__":
    main()
