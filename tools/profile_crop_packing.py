"""Measure DINO step throughput vs local-crop packing factor (VERDICT r3
item 3) and print ONE JSON line.

The DINO step spends ~half its time in n∈{37,50} attention at 25% MFU
(ROOFLINE.md §5); the five recorded negative kernel results all attacked
the kernel at FIXED n. Packing changes the arithmetic instead: `pack`
local crops fold into one sequence of n=37·pack with a block-diagonal
mask (models/vit.py VisionTransformer pack=). Outputs are tolerance-equal
(tests/test_ssl.py); this tool answers whether the bigger-n schedule is
actually faster on the chip. Timing is pipelined (donated state chains
steps, one end fence) — per-step fetches would time the ~25 ms relay RTT.

Usage: python tools/profile_crop_packing.py [batch ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from snuffy_tpu.utils.compile_cache import enable as _cc
_cc()

import numpy as np
import jax
import jax.numpy as jnp

from snuffy_tpu.models.vit import vit_small
from snuffy_tpu.ssl.dino import DINOTrainer

PACKS = (1, 2, 4, 8)
ITERS = int(os.environ.get("ITERS", "20"))


def measure(batch: int, pack: int, mode: str = "masked") -> float:
    backbone = vit_small(patch_size=16, use_adapter=True,
                         adapter_bottleneck=32, compute_dtype="bfloat16",
                         pack_mode=mode)
    tr = DINOTrainer(backbone, out_dim=65536, n_local_crops=8,
                     freeze_backbone=True, optimizer="adamw",
                     crop_pack=pack)
    state = tr.init_state(0)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.random((2, batch, 224, 224, 3)), jnp.float32)
    loc = jnp.asarray(rng.random((8, batch, 96, 96, 3)), jnp.float32)
    step = tr.get_step()
    args = (jnp.float32(5e-4), jnp.float32(0.04), jnp.float32(0.996),
            jnp.float32(0.04), jnp.asarray(1, jnp.int32),
            jax.random.PRNGKey(0))
    state, loss = step(state, g, loc, *args)
    float(np.asarray(loss))  # compile fence
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step(state, g, loc, *args)
    float(np.asarray(loss))
    return batch * ITERS / (time.perf_counter() - t0)


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [16]
    out = {"platform": jax.devices()[0].platform, "iters": ITERS}
    modes = os.environ.get("PACK_MODES", "masked,blocked").split(",")
    for b in batches:
        for p in PACKS:
            if (8 * b) % p:
                continue
            if p == 1:
                out[f"dino_sps_b{b}_pack1"] = round(measure(b, 1), 1)
                continue
            for m in modes:
                out[f"dino_sps_b{b}_pack{p}_{m}"] = round(
                    measure(b, p, m), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
