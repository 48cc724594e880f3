"""ViT-S/8 attention round 2: my batched-dot fused kernel (round-5
pattern) at n=785 (pad 896), where score blocks fit VMEM whole and the
GEMMs are 4.5x larger than the n=197 case that lost to XLA."""

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

ITERS = 20


def t(fn, args, label):
    def body(c, _):
        o = fn(*args)
        s = jnp.sum(o.astype(jnp.float32))
        return c + s, s

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


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
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
        functools.partial(_kernel, scale=64 ** -0.5, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((z, n, dk), q.dtype),
        grid=(z // bz,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


def main():
    b, n, h, dk = 64, 785, 6, 64
    z = b * h
    n_pad = 896
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((z, n, dk)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((z, n, dk)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((z, n, dk)) * 0.1, jnp.bfloat16)

    def einsum_path(q, k, v):
        a = jnp.einsum("znd,zmd->znm", q, k,
                       preferred_element_type=jnp.bfloat16) * (dk ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("znm,zmd->znd", a, v,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)

    t(einsum_path, (q, k, v), "einsum (bf16 scores)")
    for bz in (1, 2, 4):
        try:
            t(lambda qq, kk, vv, bz=bz: fused(qq, kk, vv, n, bz)[:, :n],
              (qp, kp, vp), f"pallas batched-dot bz={bz}")
        except Exception as e:
            print(f"bz={bz}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    ref = np.asarray(einsum_path(q, k, v).astype(jnp.float32))
    out = np.asarray(fused(qp, kp, vp, n, 2)[:, :n].astype(jnp.float32))
    print("max|delta| =", np.abs(ref - out).max(), " scale",
          np.abs(ref).max())


if __name__ == "__main__":
    main()
