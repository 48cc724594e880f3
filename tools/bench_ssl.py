"""SSL stage throughput on the real chip: DINO-adapter and MAE-adapter
train-step images/sec — the L3 counterpart of bench.py's MIL/embedding
numbers (reference dino_adapter/main_dino_adapter.py + mae_adapter/
main_pretrain_adapter.py train on single-node DDP GPUs; here one v5e).

Shapes follow the reference recipes: DINO ViT-S/16 with adapters frozen-
backbone (batch 16/device, 2 global 224 + 8 local 96 crops), MAE ViT-B/16
with adapters (batch 64, mask 0.75, bf16).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(np.asarray(x).sum())


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
            jnp.float32(0.04), jnp.asarray(1, jnp.int32))
    state, loss = step(state, g, l, *args, jax.random.PRNGKey(0))
    fence(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, g, l, *args, jax.random.PRNGKey(i))
    fence(loss)
    dt = (time.perf_counter() - t0) / iters
    imgs = batch * 10  # 2 global + 8 local crops per sample
    print(f"dino_adapter step {dt*1e3:8.1f} ms  "
          f"{batch/dt:7.1f} samples/s  {imgs/dt:8.1f} crops/s", flush=True)
    return batch / dt


def bench_mae(batch=64, iters=10):
    from snuffy_tpu.models.mae import mae_vit_base_patch16
    from snuffy_tpu.ssl.mae_trainer import MAETrainer

    model = mae_vit_base_patch16(use_adapter=True, adapter_bottleneck=64,
                                 compute_dtype="bfloat16")
    tr = MAETrainer(model, mask_ratio=0.75, freeze_non_adapter=True,
                    use_bf16=True)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 224, 224, 3)), jnp.float32)
    step = tr.get_step()
    state, loss = step(state, x, jnp.float32(1.5e-4), jax.random.PRNGKey(0))
    fence(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        state, loss = step(state, x, jnp.float32(1.5e-4),
                           jax.random.PRNGKey(i))
    fence(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"mae_adapter  step {dt*1e3:8.1f} ms  "
          f"{batch/dt:7.1f} images/s", flush=True)
    return batch / dt


if __name__ == "__main__":
    bench_mae()
    bench_dino()
