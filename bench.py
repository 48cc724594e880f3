"""Headline benchmark: Snuffy MIL training throughput on full-size WSI bags.

Measures fused forward+backward+optimizer steps per second on synthetic
Camelyon16-scale bags (10k patches padded to 16384, 384-d DINO-ViT-S
features, Λ=512 ≈ the reference's Λ=500 adapter config,
reference README.md:630-652) — the reference's hot loop
(train.py:223-293, one optimizer step per bag).

vs_baseline is measured against the BASELINE.json north star "embed +
classify a full ~10k-patch slide in <2 s on one chip": the MIL stage is
budgeted 10% of that (0.2 s/slide → 5 bags/s baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=384,
            num_classes=1,
            num_heads=4,
            big_lambda=512,
            random_patch_share=0.5,
            encoder_dropout=0.0,
            activation="gelu",
            depth=2,
            compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2, weight_decay=5e-2),
        soft_average=True,
    )
    trainer = SnuffyTrainer(cfg)

    n_pad, n_valid, bags = 16384, 10000, 8
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((bags, n_pad, cfg.model.feats_size)), jnp.float32
    )
    masks = jnp.asarray(np.arange(n_pad)[None, :] < n_valid).repeat(bags, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (bags, 1)), jnp.float32)

    state = trainer.init_state(0, example_n=n_pad)
    fn = trainer.train_bucket_fn(n_pad)
    lr = jnp.asarray(2e-2, jnp.float32)

    # Warmup/compile. NOTE: timing fences on an actual device→host transfer
    # of a fresh output — on the axon relay backend, block_until_ready (and
    # especially blocking on donated buffers) can return before the queued
    # compute finishes; np.asarray cannot.
    state, losses, _, _ = fn(state, feats, masks, labels, lr, jax.random.PRNGKey(0))
    float(np.asarray(losses).sum())

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, losses, _, _ = fn(
            state, feats, masks, labels, lr, jax.random.PRNGKey(i + 1)
        )
        float(np.asarray(losses).sum())
    dt = time.perf_counter() - t0

    bags_per_sec = bags * iters / dt
    baseline = 5.0  # bags/s — 10% of the <2 s/slide north-star budget
    print(
        json.dumps(
            {
                "metric": "snuffy_mil_train_bags_per_sec_10kpatch",
                "value": round(bags_per_sec, 3),
                "unit": "bags/s (fwd+bwd+opt, N=10k pad 16384, d=384, depth=2, bf16)",
                "vs_baseline": round(bags_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
