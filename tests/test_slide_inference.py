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
