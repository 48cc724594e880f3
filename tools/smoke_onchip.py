"""On-chip smoke sweep of config corners interpret-mode tests can't cover
(Mosaic lowering + scoped-VMEM limits are real-TPU-only — the Λ=900
backward VMEM overflow was invisible to the whole CPU suite).

Covers: ViT-S/8 (the actual DINO-adapter embedder, 785 tokens), MAE ViT-L
embed, the MUSK corner (Λ larger than the whole bag, d=166), multiclass
train step, and the Λ=900 recipe step. Each runs a couple of iterations
and prints ok/latency.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.utils.compile_cache import enable as _cc

_cc()


def check(label, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"OK   {label:46s} ({dt:.1f}s incl. compile; {out})",
              flush=True)
    except Exception as e:
        print(f"FAIL {label:46s} {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        traceback.print_exc(limit=2)


def vit_s8():
    from snuffy_tpu.models.vit import vit_small

    model = vit_small(patch_size=8, output="cls", compute_dtype="bfloat16",
                      use_adapter=True, adapter_bottleneck=32)
    b = 64
    x = jnp.asarray(np.random.default_rng(0).random((b, 224, 224, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], True)["params"]
    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx, True))
    out = fwd(params, x)
    float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(4):
        out = fwd(params, x)
    float(np.asarray(out).sum())
    rate = 4 * b / (time.perf_counter() - t0)
    return f"{rate:.0f} img/s"


def mae_l_embed():
    from snuffy_tpu.models.mae import mae_vit_large_patch16

    model = mae_vit_large_patch16(use_adapter=True, adapter_bottleneck=64,
                                  compute_dtype="bfloat16")
    b = 64
    x = jnp.asarray(np.random.default_rng(0).random((b, 224, 224, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "masking": jax.random.PRNGKey(1)}, x[:1], 0.75,
                        True)["params"]
    from snuffy_tpu.models.mae import MaskedAutoencoderViT

    fwd = jax.jit(lambda p, xx: model.apply(
        {"params": p}, xx, method=MaskedAutoencoderViT.embed_tokens))
    out = fwd(params, x)
    float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(4):
        out = fwd(params, x)
    float(np.asarray(out).sum())
    rate = 4 * b / (time.perf_counter() - t0)
    return f"{rate:.0f} img/s (d={out.shape[-1]})"


def _train_step(model_kw, n_pad, n_valid, d, num_classes=1, B=4):
    from snuffy_tpu.configs import (MILTrainConfig, OptimizerConfig,
                                    SnuffyModelConfig)
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(feats_size=d, num_classes=num_classes,
                                compute_dtype="bfloat16", **model_kw),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-3),
        soft_average=True,
    )
    tr = SnuffyTrainer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, n_pad, d)), jnp.float32)
    masks = jnp.asarray(np.arange(n_pad)[None] < n_valid).repeat(B, axis=0)
    if num_classes > 1:
        lab = np.zeros((B, num_classes), np.float32)
        lab[np.arange(B), np.arange(B) % num_classes] = 1.0
    else:
        lab = rng.integers(0, 2, (B, 1)).astype(np.float32)
    st = tr.init_state(0, example_n=n_pad)
    fn = tr.train_bucket_fn(n_pad)
    st, l, *_ = fn(st, feats, masks, jnp.asarray(lab), jnp.float32(2e-3),
                   jax.random.PRNGKey(0))
    l = np.asarray(l)
    assert np.isfinite(l).all(), f"non-finite loss {l}"
    return f"loss {l.mean():.3f}"


def main():
    check("ViT-S/8 embed (DINO-adapter backbone)", vit_s8)
    check("MAE ViT-L/16 embed", mae_l_embed)
    check("MUSK corner: lambda=200 > bag (d=166)", lambda: _train_step(
        dict(num_heads=2, big_lambda=200, random_patch_share=0.5, depth=1),
        n_pad=128, n_valid=40, d=166))
    check("multiclass step (TCGA shape, C=2)", lambda: _train_step(
        dict(num_heads=4, big_lambda=512, random_patch_share=0.5, depth=2,
             multiclass=True),
        n_pad=4096, n_valid=3800, d=384, num_classes=2))
    check("lambda=900 recipe step", lambda: _train_step(
        dict(num_heads=4, big_lambda=900, random_patch_share=7 / 9, depth=1),
        n_pad=10240, n_valid=10000, d=384))


if __name__ == "__main__":
    main()
