"""SSL-stage roofline: measured step time vs XLA's OWN flop count
(`compiled.cost_analysis()['flops']` — no hand-counting) for the DINO and
MAE train steps at the bench_ssl shapes, plus the same cross-check for
the MIL step (bench.py hand-counts 226 GFLOP useful/bag; XLA's number
includes selection/softmax overhead). Feeds ROOFLINE.md §5.

Run on the real chip: python tools/roofline_ssl.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12


def fence(x):
    return float(np.asarray(x).ravel()[0])


def flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca["flops"])


def report(tag, dt, fl, unit_count, unit):
    print(f"{tag:34s} {dt * 1e3:8.2f} ms  {fl / 1e9:9.1f} GFLOP "
          f"{fl / dt / 1e12:6.1f} TFLOP/s ({fl / dt / PEAK * 100:4.1f}% "
          f"peak)  {unit_count / dt:8.1f} {unit}/s", flush=True)


def bench_dino(batch=16, iters=10):
    from snuffy_tpu.models.vit import vit_small
    from snuffy_tpu.ssl.dino import DINOTrainer

    backbone = vit_small(patch_size=16, use_adapter=True,
                         adapter_bottleneck=32, compute_dtype="bfloat16")
    tr = DINOTrainer(backbone, out_dim=65536, n_local_crops=8,
                     freeze_backbone=True, optimizer="adamw")
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.random((2, batch, 224, 224, 3)), jnp.float32)
    l = jnp.asarray(rng.random((8, batch, 96, 96, 3)), jnp.float32)
    step = tr.get_step()
    args = (jnp.float32(5e-4), jnp.float32(0.04), jnp.float32(0.996),
            jnp.float32(0.04), jnp.asarray(1, jnp.int32),
            jax.random.PRNGKey(0))
    lowered = step.lower(state, g, l, *args)
    fl = flops_of(lowered.compile())
    state, loss = step(state, g, l, *args)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, g, l, *args)
    fence(loss)
    dt = (time.perf_counter() - t0) / iters
    report("DINO ViT-S/16 step (B=16, 2g+8l)", dt, fl, batch, "samples")


def bench_mae(batch=64, iters=10):
    from snuffy_tpu.models.mae import mae_vit_base_patch16
    from snuffy_tpu.ssl.mae_trainer import MAETrainer

    model = mae_vit_base_patch16(use_adapter=True, adapter_bottleneck=64,
                                 compute_dtype="bfloat16")
    tr = MAETrainer(model, mask_ratio=0.75, freeze_non_adapter=True,
                    use_bf16=True)
    state = tr.init_state(0)
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, 224, 224, 3)),
        jnp.uint8,
    )
    step = tr.get_step()
    args = (jnp.float32(1e-3), jax.random.PRNGKey(0))
    lowered = step.lower(state, imgs, *args)
    fl = flops_of(lowered.compile())
    state, loss = step(state, imgs, *args)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, imgs, *args)
    fence(loss)
    dt = (time.perf_counter() - t0) / iters
    report("MAE ViT-B/16 step (B=64, mask .75)", dt, fl, batch, "img")


def bench_mil(iters=20):
    from snuffy_tpu.configs import (
        MILTrainConfig, OptimizerConfig, SnuffyModelConfig,
    )
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=384, num_heads=4, big_lambda=512,
            random_patch_share=0.5, activation="gelu", depth=2,
            compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2),
        soft_average=True,
    )
    tr = SnuffyTrainer(cfg)
    N = 10240
    state = tr.init_state(0, example_n=N)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, N, 384)), jnp.float32
    )
    masks = jnp.asarray(np.arange(N)[None] < 10000)
    labels = jnp.ones((1, 1), jnp.float32)
    fn = tr.train_bucket_fn(N)
    args = (feats, masks, labels, jnp.float32(2e-2), jax.random.PRNGKey(0))
    fl = flops_of(fn.lower(state, *args).compile())
    state, *_ = fn(state, *args)
    fence(state.w)
    # donated state: rebuild each call would recompile-free but re-time;
    # time a fresh chain of iters single-bag scans
    t0 = time.perf_counter()
    for _ in range(iters):
        state, *_ = fn(state, *args)
    fence(state.w)
    dt = (time.perf_counter() - t0) / iters
    report("MIL step (1 bag, XLA-counted)", dt, fl, 1, "bags")
    print(f"    XLA-counted {fl / 1e9:.1f} GFLOP vs bench.py hand count "
          f"226.0 GFLOP useful", flush=True)


def main():
    stages = sys.argv[1:] or ["dino", "mae", "mil"]
    fns = {"dino": bench_dino, "mae": bench_mae, "mil": bench_mil}
    for s in stages:
        fns[s]()


if __name__ == "__main__":
    main()
