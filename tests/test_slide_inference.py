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
