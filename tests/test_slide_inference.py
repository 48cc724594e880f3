"""End-to-end single-slide inference pipeline on a synthetic WSI."""

import numpy as np
import pytest

from snuffy_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_predict_slide_end_to_end(tmp_path):
    from tests.test_tiling import make_slide

    import predict_slide as cli

    slide_path = str(tmp_path / "tumor_001.tif")
    make_slide(slide_path)

    pred = cli.main([
        "--slide", slide_path,
        "--embedder", "SimCLR", "--backbone", "resnet18",
        "--feats_size", "512", "--big_lambda", "8", "--num_heads", "2",
        "--tile_size", "256", "--embed_size", "64", "--embed_batch", "4",
        "--background_t", "5", "--objective", "20", "--base_mag", "20",
        "--workers", "0", "--bf16", "0",
    ])
    assert 0.0 <= pred.bag_score <= 1.0
    assert pred.timings["n_patches"] == len(pred.positions) > 0
    assert pred.instance_scores.shape == (pred.timings["n_patches"],)
    assert pred.timings["total_s"] > 0


def test_streaming_fast_path_matches_fallback(tmp_path, monkeypatch):
    """The native streaming path (one C grid call per row block, decode
    PREFETCH thread, async device embed, on-device bag assembly) selects
    the same tiles and produces the same scores as the per-tile fallback
    path. cpu_count is patched to 2 so the prefetch thread (auto-gated
    off on this 1-vCPU rig) is exercised."""
    import os

    from tests.test_tiling import make_slide

    import predict_slide as cli

    monkeypatch.setattr(os, "cpu_count", lambda: 2)
    slide_path = str(tmp_path / "tumor_002.tif")
    make_slide(slide_path)
    args = [
        "--slide", slide_path,
        "--embedder", "SimCLR", "--backbone", "resnet18",
        "--feats_size", "512", "--big_lambda", "8", "--num_heads", "2",
        "--tile_size", "256", "--embed_size", "64", "--embed_batch", "4",
        "--background_t", "5", "--objective", "20", "--base_mag", "20",
        "--workers", "0", "--bf16", "0",
    ]
    fast = cli.main(args)

    monkeypatch.setattr(native, "available", lambda: False)
    slow = cli.main(args)

    assert fast.positions == slow.positions
    assert fast.timings["n_patches"] == slow.timings["n_patches"]
    np.testing.assert_allclose(
        fast.instance_scores, slow.instance_scores, rtol=1e-4, atol=1e-5
    )
    assert abs(fast.bag_score - slow.bag_score) < 1e-5


def _make_jpeg_slide(path, grid=6, tile=256, seed=0):
    """JPEG-tiled pyramid with smooth 'tissue' tiles on a flat background —
    the layout real scanner WSIs use (and the one slide_read_grid_jpeg_scaled
    requires). Returns the set of tissue (col, row) positions."""
    rng = np.random.default_rng(seed)
    side = grid * tile
    level0 = np.full((side, side, 3), 245, np.uint8)
    tissue = set()
    yy, xx = np.mgrid[0:tile, 0:tile] / tile
    for r in range(grid):
        for c in range(grid):
            if (r + c) % 2 == 0:
                continue
            smooth = (
                120 + 60 * np.sin(4 * np.pi * (xx + 0.3 * r))
                + 40 * np.cos(3 * np.pi * (yy + 0.2 * c))
            )[..., None]
            tex = smooth + rng.normal(0, 12, (tile, tile, 3))
            level0[r * tile:(r + 1) * tile, c * tile:(c + 1) * tile] = (
                np.clip(tex, 0, 255).astype(np.uint8))
            tissue.add((c, r))
    native.write_tiled_tiff(path, [level0], tile=tile, jpeg_quality=75)
    return tissue


def test_scaled_grid_decode_matches_full_decode(tmp_path):
    """read_grid_scaled (raw JPEG bytes + libjpeg M/8 IDCT, VERDICT r3
    item 2) ≈ full decode + area resize, and its edge energies keep the
    tissue/background separation that the pipeline filters on."""
    import cv2

    from snuffy_tpu.native import NativeSlide

    path = str(tmp_path / "jpeg_slide.tif")
    tissue = _make_jpeg_slide(path, grid=4)
    with NativeSlide(path) as s:
        assert NativeSlide.scale_num_for(256, 224) == 7
        assert NativeSlide.scale_num_for(256, 64) == 2
        assert NativeSlide.scale_num_for(256, 100) is None
        assert NativeSlide.scale_num_for(224, 224) == 8
        assert s.scaled_grid_ok(0, 256, 224)
        assert not s.scaled_grid_ok(0, 256, 100)   # not an M/8 fraction
        assert not s.scaled_grid_ok(0, 128, 112)   # tile side mismatch

        t224, e224 = s.read_grid_scaled(0, 256, 4, 4, 0, 224)
        t256, e256 = s.read_grid(0, 256, 4, 4, 0)
    assert t224.shape == (16, 224, 224, 3)
    ref = np.stack([
        cv2.resize(t, (224, 224), interpolation=cv2.INTER_AREA)
        for t in t256
    ])
    # 7/8 IDCT truncation vs area filtering differ only in the top
    # frequency band; on smooth tissue the per-pixel agreement is tight.
    diff = np.abs(ref.astype(np.int16) - t224.astype(np.int16))
    assert diff.mean() < 6.0, diff.mean()
    # keep/drop parity: background stays ~0, tissue stays far above the
    # calibrated thresholds at BOTH decode scales
    for i in range(16):
        pos = (i % 4, i // 4)
        if pos in tissue:
            assert e224[i] > 30 and e256[i] > 30
        else:
            assert e224[i] < 5 and e256[i] < 5


def test_scaled_pipeline_matches_resize_path(tmp_path):
    """predict_slide with the scaled JPEG decode engaged selects the same
    tiles and scores within resize tolerance of the decode-at-tile-size +
    on-device-resize path it replaces."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.pipeline.slide_inference import predict_slide
    from snuffy_tpu.tiling.deepzoom import TilerConfig

    path = str(tmp_path / "jpeg_slide.tif")
    tissue = _make_jpeg_slide(path, grid=6)

    @jax.jit
    def embed_fn(p, hp, im):
        imf = im.astype(jnp.float32)
        if im.dtype == jnp.uint8:
            imf = imf / 255.0
        pooled = jax.image.resize(
            imf, (im.shape[0], 4, 4, 3), "linear", antialias=True)
        return pooled.reshape(im.shape[0], 48), None

    w = jnp.asarray(np.random.default_rng(1).standard_normal((48,)) * 0.3,
                    jnp.float32)

    @jax.jit
    def milnet_apply(p, feats, mask):
        ins = jax.nn.sigmoid(feats @ w)
        bag = jnp.sum(ins * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return ins, bag

    kwargs = dict(
        embed_fn=embed_fn, embedder_params=None, embedder_head_params=None,
        milnet_apply=milnet_apply, milnet_params=None,
        tiler_cfg=TilerConfig(objective_power=20.0, base_mag=20.0,
                              tile_size=256, background_threshold=5.0),
        embed_batch=8, embed_size=64, workers=0,
    )
    scaled = predict_slide(path, **kwargs)               # auto → engaged
    resize = predict_slide(path, scaled_decode=False, **kwargs)

    assert set(scaled.positions) == set(resize.positions) == tissue
    assert scaled.timings["n_patches"] == len(tissue)
    np.testing.assert_allclose(
        scaled.instance_scores, resize.instance_scores, atol=0.05)
    assert abs(scaled.bag_score - resize.bag_score) < 0.02
