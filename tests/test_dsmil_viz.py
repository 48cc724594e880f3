"""DSMIL baseline model + heatmap visualization."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_dsmil_forward_and_mask():
    from snuffy_tpu.models.dsmil import MILNet

    model = MILNet(feats_size=16, num_classes=2)
    rng = np.random.default_rng(0)
    n_valid, n_pad = 10, 16
    feats = np.zeros((n_pad, 16), np.float32)
    feats[:n_valid] = rng.normal(size=(n_valid, 16))
    mask = jnp.asarray(np.arange(n_pad) < n_valid)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), mask)[
        "params"
    ]
    classes, bag_logits, a = model.apply(
        {"params": params}, jnp.asarray(feats), mask
    )
    assert classes.shape == (n_pad, 2)
    assert bag_logits.shape == (2,)
    a = np.asarray(a)
    # column softmax over valid instances only: pad rows get 0 attention
    np.testing.assert_allclose(a[:n_valid].sum(axis=0), 1.0, rtol=1e-5)
    np.testing.assert_allclose(a[n_valid:], 0.0, atol=1e-7)

    # padding invariance: same bag, bigger pad → same outputs
    feats2 = np.zeros((32, 16), np.float32)
    feats2[:n_valid] = feats[:n_valid]
    mask2 = jnp.asarray(np.arange(32) < n_valid)
    _, bag2, _ = model.apply({"params": params}, jnp.asarray(feats2), mask2)
    np.testing.assert_allclose(np.asarray(bag_logits), np.asarray(bag2),
                               rtol=1e-5)


def test_dsmil_shares_query_weights():
    from snuffy_tpu.models.dsmil import BClassifier

    model = BClassifier(input_size=8, num_classes=1)
    feats = jnp.asarray(np.random.default_rng(1).normal(size=(6, 8)),
                        jnp.float32)
    c = jnp.asarray(np.random.default_rng(2).normal(size=(6, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, c)["params"]
    # one q1/q2 pair only — critical-instance queries reuse them
    assert set(params.keys()) == {"q1", "q2", "fcc_kernel", "fcc_bias"}


def test_scores_to_grid_and_blend(tmp_path):
    from snuffy_tpu.viz.heatmap import (
        blend_heatmap,
        mask_contour,
        parse_positions,
        scores_to_grid,
        visualize_attentions,
    )

    positions = parse_positions(["0_0", "1_0", "2_1", "0_2"])
    assert positions == [(0, 0), (1, 0), (2, 1), (0, 2)]
    grid = scores_to_grid(positions, np.array([0.1, 0.5, 0.9, 0.1]))
    assert grid.shape == (3, 3)
    assert grid[1, 2] == pytest.approx(1.0)   # max score rescaled to 1
    assert grid[0, 0] == pytest.approx(0.0)

    slide_gray = np.full((60, 60), 128, np.uint8)
    tumor = np.zeros((60, 60), np.uint8)
    tumor[20:40, 20:40] = 1
    img = blend_heatmap(slide_gray, grid, mask_contour(tumor))
    assert img.shape == (60, 60, 3)
    assert (img[20, 20] == (0, 255, 0)).all()  # contour drawn

    out = str(tmp_path / "h.png")
    visualize_attentions(
        np.array([0.1, 0.5, 0.9, 0.1]), ["0_0", "1_0", "2_1", "0_2"], out,
        slide_gray, tumor,
    )
    assert os.path.exists(out)
