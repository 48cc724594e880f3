"""Measure the batched-bags vs serial-scan per-bag cost ratio at the bench
operating point and print ONE JSON line.

Pins the round-3 closed thread (CLAUDE.md "Batched-bags penalty RESOLVED"):
batched mode pays a per-layer-constant vmap-backward-fusion penalty vs the
serial scan — measured 0.69× per bag at B=8 (tools/profile_batched_step.py,
tools/profile_batched_bwd_ablation.py). tests/test_perf_regression.py runs
this on the real chip under RUN_SLOW and asserts the ratio stays inside
[0.60, 0.85], so an XLA/relay update that fixes or worsens the schedule is
noticed instead of silently shipping (VERDICT r3 item 5).

Both modes are timed the pipelined way (donated state chains the steps; one
host-transfer fence at the end) — per-step fetches would time the relay's
~25 ms RTT, the exact artifact that produced the bogus round-2 "2.4×".
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from snuffy_tpu.utils.compile_cache import enable as _cc
_cc()

import numpy as np
import jax
import jax.numpy as jnp

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
from snuffy_tpu.train.trainer import SnuffyTrainer

B, N_PAD, N_VALID, D = 8, 10240, 10000, 384
ITERS = 12


def build_trainer() -> SnuffyTrainer:
    # Identical to bench.py:bench_mil_train's operating point.
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=D, num_classes=1, num_heads=4, big_lambda=512,
            random_patch_share=0.5, encoder_dropout=0.0, activation="gelu",
            depth=2, compute_dtype="bfloat16", pallas_tile_n=2048,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2, weight_decay=5e-2),
        soft_average=True,
        # This pin tracks the r3 vmap-backward-schedule thread specifically;
        # the packed impl (r5, bag_batch_impl default) has its own A/B in
        # tools/profile_packed_bags.py.
        bag_batch_impl="vmap",
    )
    return SnuffyTrainer(cfg)


def main() -> None:
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, N_PAD, D)), jnp.float32)
    masks = jnp.asarray(np.arange(N_PAD)[None, :] < N_VALID).repeat(B, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    bag_w = jnp.ones((B,), jnp.float32)
    lr = jnp.asarray(2e-2, jnp.float32)

    trainer = build_trainer()

    # Serial scan (the reference's strict one-step-per-bag semantics).
    state = trainer.init_state(0, example_n=N_PAD)
    serial_fn = trainer.train_bucket_fn(N_PAD)
    state, losses, _, _ = serial_fn(state, feats, masks, labels, lr,
                                    jax.random.PRNGKey(0))
    float(np.asarray(losses).sum())  # compile fence
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, losses, _, _ = serial_fn(state, feats, masks, labels, lr,
                                        jax.random.PRNGKey(i + 1))
    float(np.asarray(losses).sum())  # single end fence
    serial_bps = B * ITERS / (time.perf_counter() - t0)
    del state

    # Batched (one vmapped optimizer step over all B bags).
    state = trainer.init_state(0, example_n=N_PAD)
    batched_fn = trainer.train_bucket_batched_fn(N_PAD, B)
    state, losses, _, _ = batched_fn(state, feats, masks, labels, bag_w, lr,
                                     jax.random.PRNGKey(0))
    float(np.asarray(losses).sum())
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, losses, _, _ = batched_fn(state, feats, masks, labels, bag_w,
                                         lr, jax.random.PRNGKey(i + 1))
    float(np.asarray(losses).sum())
    batched_bps = B * ITERS / (time.perf_counter() - t0)

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "serial_bags_per_sec": round(serial_bps, 2),
        "batched_bags_per_sec": round(batched_bps, 2),
        "batched_over_serial": round(batched_bps / serial_bps, 4),
    }))


if __name__ == "__main__":
    main()
