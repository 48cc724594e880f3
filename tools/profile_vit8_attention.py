"""ViT-S/8 attention (n=785 tokens): einsum vs Pallas flash. Unlike the
n=197 case (where flash lost), 785x785 scores are ~473 MB/layer of HBM
traffic at b=64 — fusion has real headroom here."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    print(f"{label:40s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def main():
    b, n, h, dk = 64, 785, 6, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, dk)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, dk)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, dk)) * 0.1, jnp.bfloat16)

    def einsum_path(q, k, v):
        z = b * h
        qz, kz, vz = (t.reshape(z, n, dk) for t in (q, k, v))
        a = jnp.einsum("znd,zmd->znm", qz, kz,
                       preferred_element_type=jnp.bfloat16) * (dk ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("znm,zmd->znd", a, vz,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    t(einsum_path, (q, k, v), "einsum (bf16 scores)")

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention)

        n_pad = 896  # 785 -> multiple of 128 block
        def flash_path(q, k, v):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            # segment ids: real tokens 0..784 -> seg 1, padding -> seg 0
            seg = jnp.asarray((np.arange(n_pad) < n).astype(np.int32))
            seg = jnp.broadcast_to(seg, (b, n_pad))
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds)
            o = flash_attention(
                qp, kp, vp, segment_ids=SegmentIds(seg, seg),
                sm_scale=dk ** -0.5,
            )
            return o[:, :, :n, :]

        t(flash_path, (q, k, v), "pallas flash (pad 896, segment ids)")

        a = np.asarray(einsum_path(q, k, v).astype(jnp.float32))
        bb = np.asarray(flash_path(q, k, v).astype(jnp.float32)
                        ).reshape(b * h, n, dk)
        print("flash vs einsum max|delta| =", np.abs(a - bb).max(),
              " scale", np.abs(a).max())
    except Exception as e:
        print("flash path failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
