"""A/B the MIL hot loop on the real chip: n_pad × pallas tile_n.

Usage: python tools/bench_ab.py [n_pad,tile_n ...]   (defaults below)
Each config prints one line; timings fence on a host transfer (relay
block_until_ready can return early — CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_config(n_pad: int, tile_n: int, bags: int = 8, iters: int = 5):
    import snuffy_tpu.ops.pallas_attention as pa
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
    from snuffy_tpu.train.trainer import SnuffyTrainer

    orig = pa.fused_inverted_sparse_attention

    def patched(q, k, v, slot_valid, q_valid, **kw):
        kw["tile_n"] = tile_n
        return orig(q, k, v, slot_valid, q_valid, **kw)

    pa.fused_inverted_sparse_attention = patched
    try:
        cfg = MILTrainConfig(
            model=SnuffyModelConfig(
                feats_size=384, num_classes=1, num_heads=4, big_lambda=512,
                random_patch_share=0.5, encoder_dropout=0.0, activation="gelu",
                depth=2, compute_dtype="bfloat16",
            ),
            optim=OptimizerConfig(optimizer="adamw", lr=2e-2, weight_decay=5e-2),
            soft_average=True,
        )
        trainer = SnuffyTrainer(cfg)
        n_valid = min(10000, n_pad - 1)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(
            rng.standard_normal((bags, n_pad, 384)), jnp.float32)
        masks = jnp.asarray(np.arange(n_pad)[None, :] < n_valid).repeat(bags, 0)
        labels = jnp.asarray(rng.integers(0, 2, (bags, 1)), jnp.float32)
        state = trainer.init_state(0, example_n=n_pad)
        fn = trainer.train_bucket_fn(n_pad)
        lr = jnp.asarray(2e-2, jnp.float32)

        t0 = time.perf_counter()
        state, losses, _, _ = fn(state, feats, masks, labels, lr,
                                 jax.random.PRNGKey(0))
        float(np.asarray(losses).sum())
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(iters):
            state, losses, _, _ = fn(state, feats, masks, labels, lr,
                                     jax.random.PRNGKey(i + 1))
            float(np.asarray(losses).sum())
        dt = time.perf_counter() - t0
        bps = bags * iters / dt
        print(f"n_pad={n_pad:6d} tile_n={tile_n:5d} "
              f"{bps:8.2f} bags/s  (compile {compile_s:.1f}s)", flush=True)
    finally:
        pa.fused_inverted_sparse_attention = orig


if __name__ == "__main__":
    configs = [(16384, 1024), (10240, 1024), (10240, 512), (10240, 2048),
               (10240, 2560)]
    if len(sys.argv) > 1:
        configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    for n_pad, tile_n in configs:
        time_config(n_pad, tile_n)
