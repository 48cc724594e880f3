"""Does XLA hit the v5e int8 MXU path, and does dynamic per-row activation
quantization pay for itself at ViT-S MLP shapes?

Times: bf16 GEMM, raw int8 GEMM (pre-quantized), and the full dynamic-quant
pipeline (abs-max + round on the fly) for the MLP up-projection shape.
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


def t(fn, args, label):
    def body(carry, _):
        o = fn(*args)
        s = jnp.sum(o.astype(jnp.float32))
        return carry + s, s

    @jax.jit
    def run(c):
        c, outs = jax.lax.scan(body, c, None, length=ITERS)
        return outs

    outs = run(jnp.float32(0.0))
    float(np.asarray(outs).sum())
    t0 = time.perf_counter()
    outs = run(jnp.float32(0.0))
    float(np.asarray(outs).sum())
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def main():
    m, k, n = 256 * 197, 384, 1536  # ViT-S MLP up-proj, batch 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    sw = jnp.asarray(np.abs(rng.standard_normal(n)) * 0.01, jnp.float32)

    def bf16(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def raw_i8(xq, wq):
        return jnp.dot(xq, wq, preferred_element_type=jnp.int32)

    def dyn_i8(x, wq, sw):
        sx = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
        acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * sw[None, :]

    gf = 2 * m * k * n / 1e9
    print(f"GEMM {m}x{k}x{n}  = {gf:.1f} GF")
    t(bf16, (x, w), "bf16 GEMM")
    t(raw_i8, (xq, wq), "int8 GEMM (pre-quantized)")
    t(dyn_i8, (x, wq, sw), "int8 GEMM + dynamic row quant")

    # attention-shape QKV: m x 384 x 1152
    n2 = 1152
    w2 = jnp.asarray(rng.standard_normal((k, n2)) * 0.05, jnp.bfloat16)
    wq2 = jnp.asarray(rng.integers(-127, 127, (k, n2)), jnp.int8)
    sw2 = jnp.asarray(np.abs(rng.standard_normal(n2)) * 0.01, jnp.float32)
    t(bf16, (x, w2), "bf16 QKV GEMM (384->1152)")
    t(dyn_i8, (x, wq2, sw2), "int8 QKV GEMM + dynamic row quant")


if __name__ == "__main__":
    main()
