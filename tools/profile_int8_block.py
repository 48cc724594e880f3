"""Full ViT-S MLP block and attention-projection comparison, bf16 outputs
(what the model actually writes): bf16 vs dynamic-int8 GEMMs."""

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


def q8_cols(w):
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s


def dyn_dot(x, wq, sw):
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / sx).astype(jnp.int8)
    acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw


def main():
    m, d, f = 256 * 197, 384, 1536
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.05, jnp.bfloat16)
    w1q, s1 = q8_cols(w1)
    w2q, s2 = q8_cols(w2)

    def mlp_bf16(x):
        h = jax.nn.gelu(jnp.dot(x, w1, preferred_element_type=jnp.float32))
        return jnp.dot(h.astype(jnp.bfloat16), w2,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def mlp_i8(x):
        h = jax.nn.gelu(dyn_dot(x, w1q, s1)).astype(jnp.bfloat16)
        return dyn_dot(h, w2q, s2).astype(jnp.bfloat16)

    t(mlp_bf16, (x,), "MLP block bf16")
    t(mlp_i8, (x,), "MLP block dynamic int8")

    # numerical error
    a = np.asarray(mlp_bf16(x).astype(jnp.float32))
    b = np.asarray(mlp_i8(x).astype(jnp.float32))
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    print(f"MLP int8-vs-bf16 cosine: {cos:.6f}  "
          f"rel l2: {np.linalg.norm(a - b) / np.linalg.norm(a):.5f}")

    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.bfloat16)
    wqkvq, sq = q8_cols(wqkv)

    def qkv_bf16(x):
        return jnp.dot(x, wqkv,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def qkv_i8(x):
        return dyn_dot(x, wqkvq, sq).astype(jnp.bfloat16)

    t(qkv_bf16, (x,), "QKV proj bf16")
    t(qkv_i8, (x,), "QKV proj dynamic int8")


if __name__ == "__main__":
    main()
