"""Packed-bags batched training: B bags folded along the row axis into one
(B·N, d) program (ops/selection.py "packed bags", MILNet(segments=B),
SnuffyTrainer bag_batch_impl='packed').

Parity contract: packing is an execution layout, not a semantics change —
every test here pins packed outputs against the unpacked per-bag oracle.
Perf rationale: tools/probe_packed_m_gemm.py / tools/profile_packed_bags.py
(the MIL GEMM shapes are M-bound, ROOFLINE.md §1/§3).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.configs import (
    MILTrainConfig,
    OptimizerConfig,
    SnuffyModelConfig,
)
from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params
from snuffy_tpu.ops.pallas_attention import (
    fused_packed_inverted_sparse_attention,
)
from snuffy_tpu.ops.selection import (
    binary_selection_draw,
    binary_selection_prepare,
    multiclass_selection_draw,
    multiclass_selection_prepare,
    packed_selection_draw,
    packed_selection_prepare,
)
from snuffy_tpu.ops.sparse_attention import (
    inverted_sparse_attention,
    packed_inverted_sparse_attention,
)
from snuffy_tpu.train.trainer import SnuffyTrainer


def _qkv(rng, h, rows, slots, dk):
    q = jnp.asarray(rng.normal(size=(h, rows, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, slots, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, rows, dk)), jnp.float32)
    return q, k, v


def test_packed_attention_matches_per_segment_oracle():
    rng = np.random.default_rng(0)
    h, K, N, S, dk = 3, 4, 96, 24, 16
    q, k, v = _qkv(rng, h, K * N, K * S, dk)
    sv = jnp.asarray(rng.random((K * S,)) > 0.2)
    qv = jnp.asarray(rng.random((K * N,)) > 0.1)

    packed = packed_inverted_sparse_attention(q, k, v, sv, qv, K)
    fused = fused_packed_inverted_sparse_attention(q, k, v, sv, qv, K)
    for s in range(K):
        ref, _ = inverted_sparse_attention(
            q[:, s * N:(s + 1) * N], k[:, s * S:(s + 1) * S],
            v[:, s * N:(s + 1) * N], sv[s * S:(s + 1) * S],
            qv[s * N:(s + 1) * N],
        )
        np.testing.assert_allclose(
            np.asarray(packed[:, s * S:(s + 1) * S]), np.asarray(ref),
            rtol=1e-5, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(packed), rtol=1e-4, atol=1e-4
    )


def test_packed_fused_grads_match_oracle():
    rng = np.random.default_rng(1)
    h, K, N, S, dk = 2, 3, 64, 16, 8
    q, k, v = _qkv(rng, h, K * N, K * S, dk)
    sv = jnp.asarray(rng.random((K * S,)) > 0.2)
    qv = jnp.asarray(rng.random((K * N,)) > 0.1)

    def loss_packed(q, k, v):
        out = fused_packed_inverted_sparse_attention(q, k, v, sv, qv, K)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        tot = 0.0
        for s in range(K):
            o, _ = inverted_sparse_attention(
                q[:, s * N:(s + 1) * N], k[:, s * S:(s + 1) * S],
                v[:, s * N:(s + 1) * N], sv[s * S:(s + 1) * S],
                qv[s * N:(s + 1) * N],
            )
            tot = tot + jnp.sum(o ** 2)
        return tot

    g1 = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("multiclass", [False, True])
def test_packed_selection_matches_per_segment(multiclass):
    rng = np.random.default_rng(2)
    K, N = 4, 96
    valid = jnp.asarray(rng.random((K, N)) > 0.15)
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, K)
    if multiclass:
        logits = jnp.asarray(rng.normal(size=(K, N, 3)), jnp.float32)
        prep = packed_selection_prepare(logits, valid, 5, multiclass=True)
        sel = packed_selection_draw(key, prep, 0, N, multiclass=True)
        S = 2 * min(5 * 3, N)
    else:
        logits = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
        prep = packed_selection_prepare(logits, valid, 10)
        sel = packed_selection_draw(key, prep, 6, N)
        S = 16
    for s in range(K):
        if multiclass:
            d1 = multiclass_selection_draw(
                keys[s], multiclass_selection_prepare(logits[s], valid[s], 5)
            )
        else:
            d1 = binary_selection_draw(
                keys[s], binary_selection_prepare(logits[s], valid[s], 10), 6
            )
        seg = slice(s * S, (s + 1) * S)
        np.testing.assert_array_equal(
            np.asarray(sel.indices[seg]) - s * N, np.asarray(d1.indices)
        )
        np.testing.assert_array_equal(
            np.asarray(sel.slot_valid[seg]), np.asarray(d1.slot_valid)
        )


@pytest.mark.parametrize("use_pallas", [False, True])
def test_packed_model_forward_matches_single_bag(use_pallas):
    # k_rand=0 and deterministic=True → selection is key-independent, so the
    # packed forward must match per-bag single forwards exactly.
    rng = np.random.default_rng(3)
    K, N, D = 3, 192, 32
    cfg = SnuffyModelConfig(
        feats_size=D, num_classes=1, num_heads=4, big_lambda=24,
        random_patch_share=0.0, depth=2, use_pallas=use_pallas,
        attention_dropout=0.0,
    )
    params = init_milnet_params(cfg, seed=0, n_example=N)
    single = build_milnet(cfg)
    packed = build_milnet(cfg, segments=K)

    feats = rng.normal(size=(K, N, D)).astype(np.float32)
    masks = np.zeros((K, N), bool)
    for s, nv in enumerate((N, N - 40, N - 7)):
        masks[s, :nv] = True
    feats = feats * masks[:, :, None]

    ins_p, bag_p, _ = packed.apply(
        {"params": params}, jnp.asarray(feats.reshape(K * N, D)),
        jnp.asarray(masks.reshape(K * N)), True,
        rngs={"sparse": jax.random.PRNGKey(5)},
    )
    for s in range(K):
        ins_1, bag_1, _ = single.apply(
            {"params": params}, jnp.asarray(feats[s]), jnp.asarray(masks[s]),
            True, rngs={"sparse": jax.random.PRNGKey(5)},
        )
        np.testing.assert_allclose(
            np.asarray(ins_p[s * N:(s + 1) * N]), np.asarray(ins_1),
            rtol=2e-5, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(bag_p[s]), np.asarray(bag_1), rtol=2e-4, atol=2e-4
        )


def test_packed_model_multiclass_matches_single_bag():
    # Multiclass selection always draws a random complement share, so packed
    # and single runs see different keys. Pin parity via a set-deterministic
    # construction: per-class top-k rows are disjoint (r = k_top·C) and the
    # complement has exactly ref_dim = min(r, N−r) = r elements, so the
    # gumbel draw returns the WHOLE complement as a set — and the
    # attention/scatter/pool math is order-invariant over slots.
    K, N, D, C, ktop = 3, 24, 32, 3, 4
    rng = np.random.default_rng(4)
    cfg = SnuffyModelConfig(
        feats_size=D, num_classes=C, num_heads=4, big_lambda=2 * ktop * C,
        depth=2, multiclass=True, use_pallas=False, attention_dropout=0.0,
    )
    params = init_milnet_params(cfg, seed=0, n_example=N)
    feats = rng.normal(size=(K, N, D)).astype(np.float32) * 0.05
    kern = np.zeros((D, C), np.float32)
    for c in range(C):
        kern[c, c] = 1.0
    params["i_classifier"]["fc"] = {
        "kernel": jnp.asarray(kern), "bias": jnp.zeros((C,), jnp.float32)
    }
    for s in range(K):
        for c in range(C):
            feats[s, ktop * c:ktop * (c + 1), c] = 10.0 + np.arange(ktop)
    masks = np.ones((K, N), bool)

    single = build_milnet(cfg)
    packed = build_milnet(cfg, segments=K)
    _, bag_p, _ = packed.apply(
        {"params": params}, jnp.asarray(feats.reshape(K * N, D)),
        jnp.asarray(masks.reshape(K * N)), True,
        rngs={"sparse": jax.random.PRNGKey(5)},
    )
    for s in range(K):
        _, bag_1, _ = single.apply(
            {"params": params}, jnp.asarray(feats[s]), jnp.asarray(masks[s]),
            True, rngs={"sparse": jax.random.PRNGKey(99)},
        )
        np.testing.assert_allclose(
            np.asarray(bag_p[s]), np.asarray(bag_1), rtol=2e-4, atol=2e-4
        )


def test_packed_step_matches_vmap_step():
    rng = np.random.default_rng(5)
    B, N, D = 4, 96, 32
    model = SnuffyModelConfig(
        feats_size=D, num_heads=4, big_lambda=16, random_patch_share=0.0,
        depth=2, attention_dropout=0.0, encoder_dropout=0.0,
        use_pallas=False,
    )
    feats = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    masks_np = np.zeros((B, N), bool)
    for s, nv in enumerate((N, N - 30, N - 5, N)):
        masks_np[s, :nv] = True
    masks = jnp.asarray(masks_np)
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    bag_w = jnp.ones((B,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)

    outs = {}
    for impl in ("vmap", "packed"):
        cfg = MILTrainConfig(
            model=model, optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
            soft_average=True, bag_batch_size=B, bag_batch_impl=impl,
            use_mesh=0,
        )
        tr = SnuffyTrainer(cfg)
        state = tr.init_state(0, example_n=N)
        fn = tr.train_bucket_batched_fn(N, B)
        state2, losses, scores, ins = fn(
            state, feats, masks, labels, bag_w, lr, jax.random.PRNGKey(0)
        )
        outs[impl] = (
            np.asarray(losses), np.asarray(scores),
            jax.tree_util.tree_map(np.asarray, state2.params),
            float(state2.w),
        )

    np.testing.assert_allclose(outs["vmap"][0], outs["packed"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["vmap"][1], outs["packed"][1],
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["vmap"][2]),
                    jax.tree_util.tree_leaves(outs["packed"][2])):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
    assert abs(outs["vmap"][3] - outs["packed"][3]) < 1e-6


def test_sharded_dp_step_packs_local_bags_and_matches_single_device():
    # dp mesh over the 8 virtual devices with batch 16 → each device packs
    # its 2-bag local shard (sharded_train.local_shard). With the random
    # share and dropouts off, per-bag losses must match the single-device
    # packed step exactly (modulo dp psum reduction order in the update —
    # only the first step's losses are compared, which predate any update).
    rng = np.random.default_rng(7)
    B, N, D = 16, 96, 16
    model = SnuffyModelConfig(
        feats_size=D, num_heads=2, big_lambda=8, random_patch_share=0.0,
        attention_dropout=0.0, encoder_dropout=0.0, use_pallas=False,
    )
    feats = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    masks = jnp.asarray(np.ones((B, N), bool))
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    bag_w = jnp.ones((B,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.PRNGKey(0)

    results = {}
    for use_mesh in (0, None):
        cfg = MILTrainConfig(
            model=model, optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
            soft_average=True, bag_batch_size=B, bag_batch_impl="packed",
            use_mesh=use_mesh,
        )
        tr = SnuffyTrainer(cfg)
        assert (tr.mesh is not None) == (use_mesh is None)
        state = tr.init_state(0, example_n=N)
        if tr.mesh is not None:
            from snuffy_tpu.parallel.sharded_train import shard_state

            state = shard_state(state, tr.mesh)
        fn = tr.train_bucket_batched_fn(N, B)
        _, losses, scores, _ = fn(state, feats, masks, labels, bag_w, lr, key)
        results[use_mesh] = (np.asarray(losses), np.asarray(scores))

    # Packed keys split per local shard, so the realized selection would
    # differ between layouts if the random share were on; with k_rand=0 the
    # forward is key-independent and per-bag losses must agree.
    np.testing.assert_allclose(results[0][0], results[None][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0][1], results[None][1],
                               rtol=1e-5, atol=1e-6)


def test_packed_step_dummy_bag_random_share_dropout_finite():
    # The production corner: pallas kernel (interpret on CPU), attention
    # dropout, random share, and an all-padded zero-weight tail bag.
    rng = np.random.default_rng(6)
    B, N, D = 4, 96, 32
    model = SnuffyModelConfig(
        feats_size=D, num_heads=4, big_lambda=16, random_patch_share=0.3,
        depth=2, attention_dropout=0.1, use_pallas=True,
    )
    cfg = MILTrainConfig(
        model=model, optim=OptimizerConfig(optimizer="adam", lr=1e-3),
        soft_average=False, bag_batch_size=B, bag_batch_impl="packed",
        use_mesh=0,
    )
    tr = SnuffyTrainer(cfg)
    state = tr.init_state(0, example_n=N)
    feats = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    masks_np = np.ones((B, N), bool)
    masks_np[B - 1] = False
    bw = np.ones((B,), np.float32)
    bw[B - 1] = 0.0
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    fn = tr.train_bucket_batched_fn(N, B)
    state2, losses, scores, ins = fn(
        state, feats, jnp.asarray(masks_np), labels, jnp.asarray(bw),
        jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(losses)[:B - 1]).all()
    for leaf in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state2.params)
    ):
        assert np.isfinite(leaf).all()
