"""LARS optimizer, layer-wise LR decay, and the profiling module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.ssl.lars import (
    lars,
    layerwise_lr_decay_mask,
    scale_by_layerwise_lr,
    vit_layer_id,
)
from snuffy_tpu.utils.profiling import StageTimer


def test_lars_trust_ratio_and_bias_exclusion():
    tx = lars(momentum=0.0, weight_decay=0.1, eta=0.01)
    params = {"w": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
    grads = {"w": jnp.full((4, 4), 2.0), "bias": jnp.full((4,), 2.0)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # bias: raw gradient (no decay, no trust scaling)
    np.testing.assert_allclose(np.asarray(updates["bias"]), 2.0)
    # weight: trust ratio = eta·‖p‖/‖g + wd·p‖ scales the update
    d = 2.0 + 0.1 * 1.0
    trust = 0.01 * 4.0 / (d * 4.0)
    np.testing.assert_allclose(np.asarray(updates["w"]), d * trust, rtol=1e-5)


def test_lars_momentum_accumulates():
    tx = lars(momentum=0.5, weight_decay=0.0)
    params = {"w": jnp.ones((2, 2))}
    grads = {"w": jnp.ones((2, 2))}
    state = tx.init(params)
    u1, state = tx.update(grads, state, params)
    u2, state = tx.update(grads, state, params)
    assert float(u2["w"][0, 0]) > float(u1["w"][0, 0])


def test_vit_layer_ids_and_decay():
    assert vit_layer_id(["patch_embed", "proj", "kernel"], 12) == 0
    assert vit_layer_id(["cls_token"], 12) == 0
    assert vit_layer_id(["blocks_0", "mlp", "fc1", "kernel"], 12) == 1
    assert vit_layer_id(["blocks_11", "norm1", "scale"], 12) == 12
    assert vit_layer_id(["norm", "scale"], 12) == 12

    params = {
        "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
        "blocks_0": {"k": jnp.ones(2)},
        "norm": {"scale": jnp.ones(2)},
    }
    mask = layerwise_lr_decay_mask(params, num_layers=2, decay=0.5)
    assert mask["patch_embed"]["proj"]["kernel"] == pytest.approx(0.25)
    assert mask["blocks_0"]["k"] == pytest.approx(0.5)
    assert mask["norm"]["scale"] == pytest.approx(1.0)

    tx = scale_by_layerwise_lr(params, 2, 0.5)
    updates, _ = tx.update(
        jax.tree_util.tree_map(jnp.ones_like, params), tx.init(params), params
    )
    np.testing.assert_allclose(
        np.asarray(updates["patch_embed"]["proj"]["kernel"]), 0.25
    )


def test_stage_timer_nesting(tmp_path):
    sink = str(tmp_path / "timings.jsonl")
    t = StageTimer(sink)
    with t.stage("epoch"):
        with t.stage("train"):
            pass
        with t.stage("train"):
            pass
    s = t.summary()
    assert s["epoch"]["count"] == 1
    assert s["epoch/train"]["count"] == 2
    assert len(open(sink).read().splitlines()) == 3
