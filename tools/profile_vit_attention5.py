"""Round 5: fused attention kernel with a BATCHED in-kernel dot_general
(grid over z-blocks; one 3D dot per block instead of an unrolled per-head
loop — round 4's failure mode)."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50


def t(fn, carry0, label):
    def body(carry, _):
        x, acc = carry
        o = fn(x)
        s = jnp.sum(o.astype(jnp.float32))
        return ((x + s.astype(x.dtype) * 1e-30).astype(x.dtype), acc + s), s

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
    print(f"{label:44s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[...]  # (BZ, n_pad, dk)
    k = k_ref[...]
    v = v_ref[...]
    # batched scores: (BZ, n, n)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def fused(q, k, v, n_valid, bz):
    z, n, dk = q.shape
    spec = pl.BlockSpec((bz, n, dk), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=dk ** -0.5, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((z, n, dk), q.dtype),
        grid=(z // bz,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def main():
    b, n, h, dk = 256, 197, 6, 64
    d = h * dk
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, jnp.bfloat16)
    qkv_w = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, jnp.bfloat16)

    def einsum_path(x):
        qkv = (x @ qkv_w).reshape(b, n, 3, h, dk)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        a = jnp.einsum("znd,zmd->znm", q, k,
                       preferred_element_type=jnp.bfloat16) * (dk ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(x.dtype)
        o = jnp.einsum("znm,zmd->znd", a, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return o.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(b, n, d)

    n_pad = 208  # 197 -> multiple of 16 for the second-minor dim

    def make_fused(bz):
        def f(x):
            qkv = (x @ qkv_w).reshape(b, n, 3, h, dk)

            def fold(i):
                t_ = qkv[:, :, i].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
                return jnp.pad(t_, ((0, 0), (0, n_pad - n), (0, 0)))

            q, k, v = fold(0), fold(1), fold(2)
            o = fused(q, k, v, n_valid=n, bz=bz)[:, :n, :]
            return o.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(b, n, d)
        return f

    t(einsum_path, (x0, 0.0), "einsum (bf16 scores)")
    for bz in (8, 16, 32, 64):
        try:
            t(make_fused(bz), (x0, 0.0), f"pallas batched-dot bz={bz}")
        except Exception as e:
            print(f"bz={bz}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    ref = np.asarray(einsum_path(x0).astype(jnp.float32))
    out = np.asarray(make_fused(16)(x0).astype(jnp.float32))
    print("fused vs einsum max|delta| =", float(np.abs(ref - out).max()),
          " scale", float(np.abs(ref).max()))


if __name__ == "__main__":
    main()
