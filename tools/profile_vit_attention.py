"""Find the ViT-S forward bottleneck on the real chip.

Compares: full ViT fwd, attention-free ViT (MLP only), einsum attention
alone, pallas flash attention alone (padded to 256 with segment ids).
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
    print(f"{label:36s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def main():
    b, n, h, dk = 256, 197, 6, 64
    d = h * dk
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n, d)) * 0.02, jnp.bfloat16)
    qkv_w = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.02, jnp.bfloat16)
    mlp1 = jnp.asarray(rng.standard_normal((d, 4 * d)) * 0.02, jnp.bfloat16)
    mlp2 = jnp.asarray(rng.standard_normal((4 * d, d)) * 0.02, jnp.bfloat16)

    def attn_einsum(x):
        qkv = (x @ qkv_w).reshape(b, n, 3, h, dk).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * (dk ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return o.transpose(0, 2, 1, 3).reshape(b, n, d)

    def attn_einsum_bf16probs(x):
        qkv = (x @ qkv_w).reshape(b, n, 3, h, dk).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * (dk ** -0.5)
        a = jax.nn.softmax(a, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v,
                       preferred_element_type=jnp.bfloat16)
        return o.transpose(0, 2, 1, 3).reshape(b, n, d)

    def mlp(x):
        return jax.nn.gelu(x @ mlp1) @ mlp2

    n_pad = 256
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)

    seg = jnp.asarray((np.arange(n_pad) < n).astype(np.int32))[None].repeat(b, 0)
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    def attn_flash(x):
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        qkv = (xp @ qkv_w).reshape(b, n_pad, 3, h, dk).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        o = flash_attention(
            q, k, v, segment_ids=SegmentIds(seg, seg),
            sm_scale=float(dk ** -0.5),
            block_sizes=BlockSizes(
                block_q=128, block_k_major=128, block_k=128, block_b=8,
            ),
        )
        return o.transpose(0, 2, 1, 3).reshape(b, n_pad, d)[:, :n]

    for label, fn in (("einsum attn (f32 probs)", attn_einsum),
                      ("einsum attn (bf16 probs)", attn_einsum_bf16probs),
                      ("flash attn (padded 256)", attn_flash),
                      ("mlp only", mlp)):
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


if __name__ == "__main__":
    main()
