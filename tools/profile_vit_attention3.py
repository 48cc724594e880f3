"""Round 3: cut the softmax HBM traffic at ViT shapes.

Variants: folded-heads with f32 softmax (current), all-bf16 softmax,
f32 softmax computed on bf16-stored scores, and full-block Pallas fused
attention (scores never leave VMEM).
"""

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
    print(f"{label:40s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    # blocks: (bz, n, dk) — whole sequence resident in VMEM.
    bz = q_ref.shape[0]

    def one(i, _):
        q = q_ref[i]          # (n, dk)
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # (n, n)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[i] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, bz, one, 0)


def fused_attention(q, k, v, n_valid, bz=16):
    # q/k/v: (Z, n, dk) bf16, n and dk already padded to 128-multiples.
    z, n, dk = q.shape
    grid = (z // bz,)
    spec = pl.BlockSpec((bz, n, dk), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, scale=dk ** -0.5, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((z, n, dk), q.dtype),
        grid=grid,
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

    def folded(x, pet, softmax_f32):
        qkv = (x @ qkv_w).reshape(b, n, 3, h, dk)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        a = jnp.einsum("znd,zmd->znm", q, k,
                       preferred_element_type=pet) * (dk ** -0.5)
        if softmax_f32:
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1)
        else:
            a = jax.nn.softmax(a, axis=-1)
        a = a.astype(x.dtype)
        o = jnp.einsum("znm,zmd->znd", a, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return o.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(b, n, d)

    n_pad, dk_pad = 256, 128

    def pallas_fused(x):
        qkv = (x @ qkv_w).reshape(b, n, 3, h, dk)
        def fold(i):
            t_ = qkv[:, :, i].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
            return jnp.pad(t_, ((0, 0), (0, n_pad - n), (0, dk_pad - dk)))
        q, k, v = fold(0), fold(1), fold(2)
        o = fused_attention(q, k, v, n_valid=n)
        o = o[:, :n, :dk]
        return o.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(b, n, d)

    variants = [
        ("folded f32 scores+softmax", lambda x: folded(x, jnp.float32, True)),
        ("folded bf16 scores, f32 softmax", lambda x: folded(x, jnp.bfloat16, True)),
        ("folded all-bf16 softmax", lambda x: folded(x, jnp.bfloat16, False)),
        ("pallas fused (VMEM scores)", pallas_fused),
    ]
    for label, fn in variants:
        def body(carry, _, fn=fn):
            x, acc = carry
            o = fn(x)
            s = jnp.sum(o.astype(jnp.float32))
            return ((x + s.astype(x.dtype) * 1e-30).astype(x.dtype),
                    acc + s), s
        try:
            t(body, (x0, 0.0), label)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    ref = np.asarray(variants[0][1](x0).astype(jnp.float32))
    for label, fn in variants[1:]:
        try:
            out = np.asarray(fn(x0).astype(jnp.float32))
            print(f"{label}: max |delta| = {np.abs(ref - out).max():.6f} "
                  f"(scale {np.abs(ref).max():.4f})")
        except Exception as e:
            print(f"{label}: FAILED {e}")


if __name__ == "__main__":
    main()
