"""Break the MIL train step into components and time each on the real chip.

One dispatch through the axon relay costs ~25 ms RTT, so each component is
wrapped in a lax.scan of ITERS serialized repetitions (data-dependent carry
defeats DCE/overlap) and the reported number is scan_time/ITERS. Timings
fence on host transfers (relay block_until_ready returns early).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def scan_time(make_body, carry0, label):
    """make_body: (carry, _) -> (carry, out_scalar). Times ITERS serialized
    repetitions inside one program; prints per-iteration ms."""

    @jax.jit
    def run(carry):
        carry, outs = jax.lax.scan(
            make_body, carry, None, length=ITERS
        )
        return outs

    outs = run(carry0)
    float(np.asarray(outs).sum())  # compile + fence
    t0 = time.perf_counter()
    outs = run(carry0)
    float(np.asarray(outs).sum())
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt / ITERS * 1e3:8.3f} ms/iter", flush=True)


def main():
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
    from snuffy_tpu.ops.pallas_attention import fused_inverted_sparse_attention
    from snuffy_tpu.ops.selection import (
        binary_selection_draw, binary_selection_prepare)
    from snuffy_tpu.train.trainer import SnuffyTrainer

    n_pad, d, lam, heads = 10240, 384, 512, 4
    tile_n = int(os.environ.get("TILE_N", "2048"))
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=d, num_classes=1, num_heads=heads, big_lambda=lam,
            random_patch_share=0.5, encoder_dropout=0.0, activation="gelu",
            depth=2, compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2, weight_decay=5e-2),
        soft_average=True,
    )
    trainer = SnuffyTrainer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
    mask = jnp.asarray(np.arange(n_pad) < 10000)
    label = jnp.asarray([1.0], jnp.float32)
    state = trainer.init_state(0, example_n=n_pad)
    lr = jnp.asarray(2e-2, jnp.float32)

    # --- full train step (the scanned hot loop itself)
    def step_body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        st, loss, _, _ = trainer._train_step(st, feats, mask, label, lr, sub)
        return (st, key), loss
    scan_time(step_body, (state, jax.random.PRNGKey(0)), "full step (fwd+bwd+opt)")

    # --- forward only
    def fwd_body(carry, _):
        key, acc = carry
        key, k1 = jax.random.split(key)
        loss, _ = trainer._bag_loss_fn(
            {"model": state.params, "w": state.w}, feats, mask, label,
            {"sparse": k1, "dropout": k1}, False)
        return (key, acc + loss), loss
    scan_time(fwd_body, (jax.random.PRNGKey(0), 0.0), "forward only")

    # --- selection: prepare + 2 per-layer draws
    logits = jnp.asarray(rng.standard_normal(n_pad), jnp.float32)
    def sel_body(carry, _):
        key, acc = carry
        key, k1, k2 = jax.random.split(key, 3)
        prep = binary_selection_prepare(logits + acc * 1e-30, mask, lam // 2)
        s1 = binary_selection_draw(k1, prep, lam - lam // 2)
        s2 = binary_selection_draw(k2, prep, lam - lam // 2)
        out = jnp.sum(s1.indices) + jnp.sum(s2.indices)
        return (key, acc + out.astype(jnp.float32)), out
    scan_time(sel_body, (jax.random.PRNGKey(0), 0.0), "selection (prep+2draws)")

    # --- pallas attention fwd (one layer shape)
    dk = d // heads
    q = jnp.asarray(rng.standard_normal((heads, n_pad, dk)), jnp.bfloat16)
    k_ = jnp.asarray(rng.standard_normal((heads, lam, dk)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((heads, n_pad, dk)), jnp.bfloat16)
    sv = jnp.ones((lam,), bool)

    def attn_body(carry, _):
        qq, acc = carry
        out = fused_inverted_sparse_attention(qq, k_, v, sv, mask,
                                              tile_n=tile_n)
        s = jnp.sum(out.astype(jnp.float32))
        return ((qq + s.astype(qq.dtype) * 1e-30).astype(qq.dtype),
                acc + s), s
    scan_time(attn_body, (q, 0.0), "pallas attn fwd")

    # --- pallas attention fwd+bwd
    def attn_loss(qq):
        return jnp.sum(fused_inverted_sparse_attention(
            qq, k_, v, sv, mask, tile_n=tile_n).astype(jnp.float32))
    def attng_body(carry, _):
        qq, acc = carry
        s, dq = jax.value_and_grad(attn_loss)(qq)
        return (qq + dq * 1e-30, acc + s), s
    scan_time(attng_body, (q, 0.0), "pallas attn fwd+bwd")

    # --- FFN fwd+bwd (one layer)
    w1 = jnp.asarray(rng.standard_normal((d, 4 * d)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4 * d, d)) * 0.02, jnp.bfloat16)
    x = feats.astype(jnp.bfloat16)
    def ffn_loss(w1w2):
        a, b = w1w2
        return jnp.sum((jax.nn.gelu(x @ a) @ b).astype(jnp.float32))
    def ffn_body(carry, _):
        ws, acc = carry
        s, g = jax.value_and_grad(ffn_loss)(ws)
        return ((ws[0] + g[0] * 1e-30, ws[1] + g[1] * 1e-30), acc + s), s
    scan_time(ffn_body, ((w1, w2), 0.0), "FFN fwd+bwd (1 layer)")

    # --- QKV/O projections fwd+bwd (per layer: q,v over N; k,o over S)
    wq = jnp.asarray(rng.standard_normal((d, d)) * 0.02, jnp.bfloat16)
    sel_tok = jnp.asarray(rng.standard_normal((lam, d)), jnp.bfloat16)
    def qkv_loss(w):
        qp = x @ w
        vp = x @ w
        kp = sel_tok @ w
        op = sel_tok @ w
        return (jnp.sum(qp.astype(jnp.float32)) + jnp.sum(vp.astype(jnp.float32))
                + jnp.sum(kp.astype(jnp.float32)) + jnp.sum(op.astype(jnp.float32)))
    def qkv_body(carry, _):
        w, acc = carry
        s, g = jax.value_and_grad(qkv_loss)(w)
        return (w + g * 1e-30, acc + s), s
    scan_time(qkv_body, (wq, 0.0), "QKVO proj fwd+bwd (1 layer)")

    # --- top_k implementations head-to-head (selection's inner op)
    scores = jnp.asarray(rng.standard_normal(n_pad), jnp.float32)
    def topk_body(carry, _):
        x, acc = carry
        vals, idx = jax.lax.top_k(x, lam // 2)
        s = jnp.sum(vals) + jnp.sum(idx).astype(jnp.float32)
        return (x + s * 1e-30, acc + s), s
    scan_time(topk_body, (scores, 0.0), "lax.top_k k=256")

    def approx_body(carry, _):
        x, acc = carry
        vals, idx = jax.lax.approx_max_k(
            x, lam // 2, recall_target=1.0, aggregate_to_topk=True)
        s = jnp.sum(vals) + jnp.sum(idx).astype(jnp.float32)
        return (x + s * 1e-30, acc + s), s
    scan_time(approx_body, (scores, 0.0), "approx_max_k recall=1.0")

    def approx95_body(carry, _):
        x, acc = carry
        vals, idx = jax.lax.approx_max_k(
            x, lam // 2, recall_target=0.95, aggregate_to_topk=True)
        s = jnp.sum(vals) + jnp.sum(idx).astype(jnp.float32)
        return (x + s * 1e-30, acc + s), s
    scan_time(approx95_body, (scores, 0.0), "approx_max_k recall=0.95")

    # exactness check: approx_max_k(recall=1.0) vs lax.top_k on unique values
    v1, i1 = jax.jit(lambda x: jax.lax.top_k(x, lam // 2))(scores)
    v2, i2 = jax.jit(lambda x: jax.lax.approx_max_k(
        x, lam // 2, recall_target=1.0, aggregate_to_topk=True))(scores)
    print("approx(1.0) exact match:",
          bool(np.array_equal(np.asarray(i1), np.asarray(i2))),
          flush=True)


if __name__ == "__main__":
    main()
