"""Headline benchmark: Snuffy MIL training throughput on full-size WSI bags.

Measures fused forward+backward+optimizer steps per second on synthetic
Camelyon16-scale bags (10k patches padded to the 10240 bucket, 384-d
DINO-ViT-S features, Λ=512 ≈ the reference's Λ=500 adapter config,
reference README.md:630-652) — the reference's hot loop
(train.py:223-293, one optimizer step per bag).

vs_baseline compares against the MEASURED reference hot loop: the actual
torch implementation driven at the identical operating point on the CPU in
this container (tools/bench_reference_torch.py writes it into
BASELINE.json under measured.*; no CUDA hardware is present, so torch-CPU
is the reference's runnable configuration here).

Variance discipline (VERDICT r4 item 1): every throughput is measured over
REPEATS independent windows, each sized to >= TARGET_WINDOW_S seconds of
measured work (a short probe window calibrates the iteration count), and
the JSON carries median + min/max. A 0.15 s window against the relay's
~25 ms dispatch RTT under-reads by ~17% — that fixed cost is exactly the
r4 DINO 537-vs-650 discrepancy; 2 s windows push it below 1.5%.

Timing: iterations are queued back-to-back (state donation chains them) and
fenced ONCE with a host transfer at the end — steady-state training
throughput, with the relay's ~25 ms dispatch RTT overlapped the way a real
epoch overlaps it. block_until_ready alone is not a fence on the axon relay.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
extra carries the other BASELINE.json targets (useful-work MFU, ViT-S
patch embeddings/sec/chip, device-side e2e slide latency, fused e2e with
and without host JPEG decode, SSL step throughputs), each with a
*_spread = {min, max, repeats} companion.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.utils.compile_cache import enable as _enable_compile_cache

# The relay recompiles every program per process (tens of seconds each;
# the DINO/MAE train steps alone add ~10 min cold). The persistent cache
# works through the relay, so a warmed .jax_cache turns this script from
# compile-bound (~20 min) to measurement-bound (~5 min).
_enable_compile_cache()

REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
TARGET_WINDOW_S = float(os.environ.get("BENCH_WINDOW_S", "2.0"))
PROBE_ITERS = 6


def _spread(values):
    return {
        "min": round(min(values), 1),
        "max": round(max(values), 1),
        "repeats": len(values),
    }


def measure_rate(step_once, units_per_iter: float, fence) -> tuple:
    """Generic repeated-window throughput measurement.

    step_once() queues one iteration (no host sync); fence() blocks until
    every queued iteration has truly finished (a real host transfer — the
    relay's block_until_ready is not a fence). A PROBE_ITERS probe window
    estimates the rate, then REPEATS windows of >= TARGET_WINDOW_S run
    back-to-back. Returns (median, [window rates])."""
    t0 = time.perf_counter()
    for _ in range(PROBE_ITERS):
        step_once()
    fence()
    probe_dt = time.perf_counter() - t0
    iters = max(PROBE_ITERS,
                math.ceil(TARGET_WINDOW_S * PROBE_ITERS / probe_dt))
    rates = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(iters):
            step_once()
        fence()
        dt = time.perf_counter() - t0
        rates.append(units_per_iter * iters / dt)
    return statistics.median(rates), rates


def _measured_baseline(key: str, default: float) -> float:
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE.json")) as f:
            base = json.load(f)
        return float(base["measured"][key]["value"])
    except Exception:
        return default


def measured_baseline_bags_per_sec(default: float = 0.060) -> float:
    return _measured_baseline("reference_mil_train_bags_per_sec", default)


def bench_mil_train():
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
            pallas_tile_n=2048,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2, weight_decay=5e-2),
        soft_average=True,
    )
    trainer = SnuffyTrainer(cfg)

    n_pad, n_valid, bags = 10240, 10000, 8
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((bags, n_pad, cfg.model.feats_size)), jnp.float32
    )
    masks = jnp.asarray(np.arange(n_pad)[None, :] < n_valid).repeat(bags, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (bags, 1)), jnp.float32)

    state_box = [trainer.init_state(0, example_n=n_pad)]
    loss_box = [None]
    fn = trainer.train_bucket_fn(n_pad)
    lr = jnp.asarray(2e-2, jnp.float32)
    key_box = [0]

    def step_once():
        key_box[0] += 1
        state_box[0], loss_box[0], _, _ = fn(
            state_box[0], feats, masks, labels, lr,
            jax.random.PRNGKey(key_box[0]),
        )

    def fence():
        final = float(np.asarray(loss_box[0]).sum())
        assert np.isfinite(final)

    # Warmup/compile, fenced by a real host transfer.
    step_once()
    fence()
    bags_per_sec, windows = measure_rate(step_once, bags, fence)

    # Useful-work MFU: analytic fwd FLOPs on the VALID prefix × 3 (bwd ≈ 2×).
    n, d, s, c = n_valid, cfg.model.feats_size, cfg.model.big_lambda, 1
    per_layer = 20 * n * d * d + 4 * s * d * d + 4 * n * s * d
    fwd = cfg.model.depth * per_layer + 2 * n * d * c
    train_flops = 3 * fwd
    v5e_bf16_peak = 197e12  # v5e: 394 TOPS int8, 197 TFLOP/s bf16
    mfu = bags_per_sec * train_flops / v5e_bf16_peak
    return bags_per_sec, windows, train_flops, mfu


def build_inference_programs():
    """The two jitted programs every inference stage shares: the ViT-S/16
    DINO embedder (uint8-in, f32-feats-out — the compute_feats contract)
    and the Snuffy classifier at the 10240 bucket. Built ONCE: the relay
    pays a fresh multi-10s remote compile per program per process, so the
    throughput, latency and fused-e2e stages below all reuse these."""
    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.embed.registry import build_embedder
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params

    emb = build_embedder("DINO", "vit_small", patch_size=16,
                         compute_dtype="bfloat16")
    embed_fn = emb.jit_apply()

    cfg = SnuffyModelConfig(
        feats_size=384, num_classes=1, num_heads=4, big_lambda=512,
        random_patch_share=0.5, activation="gelu", depth=2,
        compute_dtype="bfloat16", pallas_tile_n=2048,
    )
    model = build_milnet(cfg)
    params = init_milnet_params(cfg, seed=0, n_example=10240)

    def milnet_apply(p, feats, mask):
        ins, bag, _ = model.apply(
            {"params": p}, feats, mask, True,
            rngs={"sparse": jax.random.PRNGKey(0)},
        )
        return jax.nn.sigmoid(ins[:, 0]), jax.nn.sigmoid(bag[0])

    milnet_jit = jax.jit(milnet_apply)
    # Warm both (compile is not slide latency in steady-state serving).
    embed_fn(emb.params, emb.head_params,
             jnp.zeros((256, 224, 224, 3), jnp.uint8))
    out = milnet_jit(params, jnp.zeros((10240, 384), jnp.float32),
                     jnp.ones((10240,), bool))
    jax.block_until_ready(out)
    return emb, embed_fn, milnet_jit, params


def bench_embeddings_per_sec(emb, embed_fn):
    """ViT-S/16 deterministic forward throughput (patches/sec/chip) — the
    BASELINE.json 'patch embeddings/sec/chip' target, measured on the SAME
    jitted program the extraction/fused pipelines run (uint8 patches,
    on-device normalization: 4x less host→device traffic than f32)."""
    batch = 256
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch, 224, 224, 3)),
        jnp.uint8,
    )
    out_box = [None]

    def step_once():
        out_box[0], _ = embed_fn(emb.params, emb.head_params, x)

    def fence():
        float(np.asarray(out_box[0][0, 0]))

    step_once()
    fence()
    return measure_rate(step_once, batch, fence)


def bench_slide_latency(emb_per_sec: float, milnet_jit, params):
    """Device-side end-to-end latency for one ~10k-patch slide:
    embed (ViT-S) + classify (Snuffy fwd) — the <2 s north star,
    excluding the host link (see fused_e2e for the with-host number)."""
    n_pad, n_valid = 10240, 10000
    embed_s = n_valid / emb_per_sec

    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_pad, 384)), jnp.float32
    )
    mask = jnp.asarray(np.arange(n_pad) < n_valid)
    out_box = [None]

    def step_once():
        out_box[0] = milnet_jit(params, feats, mask)

    def fence():
        float(np.asarray(out_box[0][1]))

    step_once()
    fence()
    rate, windows = measure_rate(step_once, 1.0, fence)
    classify_s = 1.0 / rate
    return embed_s + classify_s, embed_s, classify_s


def _ensure_bench_slide(path="/tmp/bench_fused_slide.tif", side=100):
    """side×side tiles of 256² → 10k patches at 20×."""
    from snuffy_tpu import native

    if not (os.path.exists(path)
            and os.path.getsize(path) > 100 * 1024 * 1024):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, (256, 256, 3), np.uint8)
        level0 = np.tile(base, (side, side, 1))
        native.write_tiled_tiff(path, [level0], tile=256, jpeg_quality=75)
        del level0
    return path


def bench_fused_e2e(emb, embed_fn, milnet_jit, params):
    """MEASURED fused end-to-end slide inference (VERDICT r2 item 2): build
    a synthetic ~10k-tile pyramidal TIF on disk, then run
    pipeline.slide_inference.predict_slide with host JPEG decode +
    background filter included. Runs twice and reports the warm pass (the
    cold pass compiles the pipeline's two small glue programs); the
    breakdown's read_filter_s overlaps the async device embedding, and
    embed_s is the blocked tail after the last block decode."""
    from snuffy_tpu import native
    from snuffy_tpu.pipeline.slide_inference import predict_slide
    from snuffy_tpu.tiling.deepzoom import TilerConfig

    if not native.available():
        return None

    path = _ensure_bench_slide()
    timings = None
    for _ in range(2):
        pred = predict_slide(
            path, embed_fn, emb.params, emb.head_params, milnet_jit, params,
            tiler_cfg=TilerConfig(objective_power=20.0, base_mag=20.0,
                                  tile_size=256, background_threshold=5.0),
            embed_batch=256, embed_size=224, workers=0,
        )
        timings = pred.timings
    return timings


def bench_fused_e2e_device(emb, embed_fn, milnet_jit, params):
    """Decode-free fused e2e (VERDICT r4 item 6): the same 10k-tile slide
    with every tile ALREADY decoded in host RAM — measures upload + embed +
    classify only. The on-disk fused number above is decode-bound on this
    1-vCPU host (decode and relay-upload serialization fight for the same
    core), which whipsaws round-over-round comparisons; this one isolates
    the device-path cost the TPU design actually controls. REPEATS passes,
    median + spread."""
    from snuffy_tpu import native
    from snuffy_tpu.native import NativeSlide

    if not native.available():
        return None

    path = _ensure_bench_slide()
    slide = NativeSlide(path)
    level, read, embed_size = 0, 256, 224
    lw, lh = slide.level_dimensions(level)
    cols, rows = lw // read, lh // read
    # Decode once (scaled 7/8 IDCT straight to embed size — the same
    # decode the fused pipeline uses), keep everything.
    blocks = []
    block_rows = 10
    for r0 in range(0, rows, block_rows):
        nb = min(block_rows, rows - r0)
        tiles_blk, _ = slide.read_grid_scaled(level, read, cols, nb, r0,
                                              embed_size)
        blocks.append(tiles_blk)
    slide.close()
    tiles = np.concatenate(blocks)
    del blocks
    n = len(tiles)
    n_pad = 10240
    mask = jnp.asarray(np.arange(n_pad) < min(n, n_pad))

    write_chunk = jax.jit(
        lambda buf, f, start: jax.lax.dynamic_update_slice(
            buf, f.astype(buf.dtype), (start, 0)),
        donate_argnums=(0,),
    )
    batch = 256

    def one_pass():
        t0 = time.perf_counter()
        bag = jnp.zeros((n_pad + batch, 384), jnp.float32)
        for start in range(0, n, batch):
            chunk = tiles[start:start + batch]
            if len(chunk) < batch:
                chunk = np.concatenate([
                    chunk,
                    np.zeros((batch - len(chunk),) + chunk.shape[1:],
                             np.uint8),
                ])
            feats, _ = embed_fn(emb.params, emb.head_params,
                                jnp.asarray(chunk))
            bag = write_chunk(bag, feats, jnp.int32(start))
        ins, score = milnet_jit(params, bag[:n_pad], mask)
        float(np.asarray(score))  # fence
        return time.perf_counter() - t0

    one_pass()  # warm the glue programs
    times = [one_pass() for _ in range(REPEATS)]
    return {
        "fused_e2e_device_s": round(statistics.median(times), 4),
        "fused_e2e_device_s_spread": {
            "min": round(min(times), 4), "max": round(max(times), 4),
            "repeats": len(times),
        },
        "n_patches": n,
    }


def bench_ssl_throughputs():
    """DINO and MAE train-step throughputs (VERDICT r3 item 8) at the
    ROOFLINE.md §5 operating points — so every headline path lands in
    BENCH_r*.json. MAE runs WITH the device-side reference augmentation
    (RandomResizedCrop+hflip+normalize), which should be ~free at 31% MFU.
    Windows sized to >= TARGET_WINDOW_S (VERDICT r4: 5-iter windows were
    ~0.15 s against a ~25 ms dispatch floor — pure under-read)."""
    from snuffy_tpu.models.mae import mae_vit_base_patch16
    from snuffy_tpu.models.vit import vit_small
    from snuffy_tpu.ssl.dino import DINOTrainer
    from snuffy_tpu.ssl.mae_trainer import MAETrainer

    rng = np.random.default_rng(0)

    backbone = vit_small(patch_size=16, use_adapter=True,
                         adapter_bottleneck=32, compute_dtype="bfloat16")
    # crop_pack=2: fold pairs of n=37 local crops into one n=74 sequence
    # with a block-diagonal mask — math-preserving (tests/test_ssl.py),
    # measured +7% at B=16 / +3% at B=64 on chip (ROUND4.md item 3).
    tr = DINOTrainer(backbone, out_dim=65536, n_local_crops=8,
                     freeze_backbone=True, optimizer="adamw", crop_pack=2)
    batch = 16
    g = jnp.asarray(rng.random((2, batch, 224, 224, 3)), jnp.float32)
    loc = jnp.asarray(rng.random((8, batch, 96, 96, 3)), jnp.float32)
    step = tr.get_step()
    args = (jnp.float32(5e-4), jnp.float32(0.04), jnp.float32(0.996),
            jnp.float32(0.04), jnp.asarray(1, jnp.int32),
            jax.random.PRNGKey(0))
    dstate_box = [tr.init_state(0)]
    dloss_box = [None]

    def dino_once():
        dstate_box[0], dloss_box[0] = step(dstate_box[0], g, loc, *args)

    def dino_fence():
        float(np.asarray(dloss_box[0]))

    dino_once()
    dino_fence()
    dino_sps, dino_windows = measure_rate(dino_once, batch, dino_fence)
    del dstate_box, g, loc, step

    model = mae_vit_base_patch16(use_adapter=True, adapter_bottleneck=64,
                                 compute_dtype="bfloat16")
    # img_pack=2: two masked images per encoder sequence (n=50 → n=100),
    # measured +3.7% at B=64 on chip (ROUND4.md item 3).
    mtr = MAETrainer(model, mask_ratio=0.75, freeze_non_adapter=True,
                     use_bf16=True, augment=True, img_pack=2)
    mbatch = 64
    imgs = jnp.asarray(rng.integers(0, 256, (mbatch, 224, 224, 3)),
                       jnp.uint8)
    mstep = mtr.get_step()
    margs = (jnp.float32(1e-3), jax.random.PRNGKey(0))
    mstate_box = [mtr.init_state(0)]
    mloss_box = [None]

    def mae_once():
        mstate_box[0], mloss_box[0] = mstep(mstate_box[0], imgs, *margs)

    def mae_fence():
        float(np.asarray(mloss_box[0]))

    mae_once()
    mae_fence()
    mae_ips, mae_windows = measure_rate(mae_once, mbatch, mae_fence)
    return dino_sps, dino_windows, mae_ips, mae_windows


def main():
    bags_per_sec, mil_windows, train_flops, mfu = bench_mil_train()
    emb, embed_fn, milnet_jit, params = build_inference_programs()
    (emb_per_sec, emb_windows) = bench_embeddings_per_sec(emb, embed_fn)
    e2e_s, embed_s, classify_s = bench_slide_latency(
        emb_per_sec, milnet_jit, params
    )
    fused = bench_fused_e2e(emb, embed_fn, milnet_jit, params)
    fused_dev = bench_fused_e2e_device(emb, embed_fn, milnet_jit, params)
    del emb, embed_fn, milnet_jit, params
    dino_sps, dino_windows, mae_ips, mae_windows = bench_ssl_throughputs()
    baseline = measured_baseline_bags_per_sec()
    extra = {
        "mil_train_useful_mfu": round(mfu, 4),
        "mil_train_flops_per_bag": train_flops,
        "mil_bags_per_sec_spread": _spread(mil_windows),
        "vit_s16_embeddings_per_sec_chip": round(emb_per_sec, 1),
        "vit_s16_embeddings_per_sec_spread": _spread(emb_windows),
        # vs the measured torch-CPU reference ViT forward in THIS
        # container (tools/bench_reference_torch.py extract; recorded
        # in BASELINE.json measured)
        "vs_reference_torch_extraction": round(
            emb_per_sec / _measured_baseline(
                "reference_vit_s16_imgs_per_sec", 11.67
            ), 1
        ),
        "e2e_slide_latency_s": round(e2e_s, 4),
        "e2e_embed_s": round(embed_s, 4),
        "e2e_classify_s": round(classify_s, 4),
        # ONE measured fused run on a real on-disk 10k-tile slide, host
        # JPEG decode + filter included (decode-bound on this 1-vCPU
        # host); fused_e2e_device is the same slide with tiles
        # pre-decoded in RAM — upload+embed+classify only, the part the
        # TPU design controls (VERDICT r4 item 6).
        "fused_e2e": (
            {k: round(v, 4) if isinstance(v, float) else v
             for k, v in fused.items()}
            if fused else None
        ),
        "fused_e2e_device": fused_dev,
        # SSL pretraining steps at the ROOFLINE.md §5 points
        # (MAE includes the device-side reference augment)
        "dino_samples_per_sec": round(dino_sps, 1),
        "dino_samples_per_sec_spread": _spread(dino_windows),
        "mae_img_per_sec": round(mae_ips, 1),
        "mae_img_per_sec_spread": _spread(mae_windows),
        "reference_baseline_bags_per_sec": baseline,
        "vs_5bags_per_sec_budget": round(bags_per_sec / 5.0, 1),
        "bench_window_s": TARGET_WINDOW_S,
    }
    print(
        json.dumps(
            {
                "metric": "snuffy_mil_train_bags_per_sec_10kpatch",
                "value": round(bags_per_sec, 3),
                "unit": "bags/s (fwd+bwd+opt, N=10k pad 10240, d=384, "
                        "depth=2, bf16; median of %d windows >=%.0fs; vs "
                        "measured torch-CPU reference hot loop)"
                        % (REPEATS, TARGET_WINDOW_S),
                "vs_baseline": round(bags_per_sec / baseline, 1),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
