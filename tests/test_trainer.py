"""End-to-end MIL training on synthetic separable data (the CPU-runnable
smoke slice, standing in for the reference's MUSK-v1 recipe,
reference README.md:685-696) plus unit checks of the loss/optimizer
semantics (reference train.py:828-854)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
from snuffy_tpu.train.losses import bce_with_logits, mixed_mil_loss
from snuffy_tpu.train.runner import Runner, bucket_bags
from snuffy_tpu.train.schedules import cosine_annealing
from snuffy_tpu.train.trainer import SnuffyTrainer
from snuffy_tpu.utils.logging import MetricsLogger


def make_synthetic_mil(rng, num_bags=30, d=32, n_lo=20, n_hi=60, direction=None):
    """Positive bags contain a few instances from a shifted Gaussian.

    `direction` must be shared across splits for the task to generalize.
    """
    labels, feats = [], []
    if direction is None:
        direction = rng.standard_normal(d)
    direction = direction / np.linalg.norm(direction)
    for i in range(num_bags):
        n = int(rng.integers(n_lo, n_hi))
        x = rng.standard_normal((n, d)).astype(np.float32)
        y = i % 2
        if y:
            k = max(2, n // 5)
            x[:k] += 3.0 * direction
        labels.append(np.array([float(y)], np.float32))
        feats.append(x)
    return labels, feats, None, None


def tiny_cfg(**kw):
    model = SnuffyModelConfig(
        feats_size=32,
        num_classes=1,
        num_heads=2,
        big_lambda=8,
        random_patch_share=0.25,
        mlp_multiplier=2,
        encoder_dropout=0.0,
        attention_dropout=0.0,
        depth=1,
    )
    return MILTrainConfig(
        model=model,
        optim=OptimizerConfig(optimizer="adamw", lr=2e-3, betas=(0.9, 0.999)),
        num_epochs=kw.pop("num_epochs", 8),
        dataset="musk1",  # MIL dataset → pos_weight path
        save_path=kw.pop("save_path", "/tmp/snuffy_tpu_test_runs"),
        seed=3,
        **kw,
    )


def test_bce_matches_manual():
    logits = jnp.array([0.5, -1.2, 3.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    pw = jnp.array(2.0)
    p = jax.nn.sigmoid(logits)
    expected = -np.mean(
        np.asarray(pw * targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    )
    got = float(bce_with_logits(logits, targets, pw))
    assert abs(got - expected) < 1e-4


def test_mixed_loss_masks_padding():
    ins = jnp.array([[5.0], [1.0], [99.0]])  # last row is padding
    mask = jnp.array([True, True, False])
    bag_logits = jnp.array([0.3])
    label = jnp.array([1.0])
    loss, score = mixed_mil_loss(ins, bag_logits, label, mask, jnp.asarray(0.5))
    # max over valid instances is 5.0, not 99.0
    expected_max = 5.0
    expected_loss = 0.5 * float(bce_with_logits(bag_logits, label)) + 0.5 * float(
        bce_with_logits(jnp.array([expected_max]), label)
    )
    assert abs(float(loss) - expected_loss) < 1e-5
    expected_score = 0.5 * jax.nn.sigmoid(expected_max) + 0.5 * jax.nn.sigmoid(0.3)
    assert abs(float(score[0]) - float(expected_score)) < 1e-5


def test_w_frozen_without_soft_average():
    cfg = tiny_cfg(soft_average=False, num_epochs=1)
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0, example_n=16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 16, 32)), jnp.float32)
    masks = jnp.ones((2, 16), bool)
    labels = jnp.ones((2, 1), jnp.float32)
    fn = trainer.train_bucket_fn(16)
    state2, *_ = fn(
        state, feats, masks, labels, jnp.asarray(1e-3), jax.random.PRNGKey(0)
    )
    assert float(state2.w) == 0.5


def test_w_learns_and_clamps_with_soft_average():
    cfg = tiny_cfg(soft_average=True, num_epochs=1)
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0, example_n=16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((6, 16, 32)), jnp.float32)
    masks = jnp.ones((6, 16), bool)
    labels = jnp.ones((6, 1), jnp.float32)
    fn = trainer.train_bucket_fn(16)
    state2, *_ = fn(
        state, feats, masks, labels, jnp.asarray(1e-2), jax.random.PRNGKey(0)
    )
    w = float(state2.w)
    assert w != 0.5
    assert 0.0 <= w <= 1.0


def test_bucket_bags_groups_and_masks():
    rng = np.random.default_rng(0)
    labels, feats, _, _ = make_synthetic_mil(rng, num_bags=10)
    bucketed = bucket_bags(labels, feats, rng=rng)
    total = 0
    for n_pad, (f, m, l, idx) in bucketed.items():
        assert f.shape[1] == n_pad and m.shape[1] == n_pad
        # strict bucket: at least one pad row per bag
        assert (m.sum(axis=1) < n_pad).all()
        total += len(idx)
    assert total == 10


def test_end_to_end_training_learns():
    rng = np.random.default_rng(42)
    direction = rng.standard_normal(32)
    train = make_synthetic_mil(rng, num_bags=40, direction=direction)
    valid = make_synthetic_mil(rng, num_bags=20, direction=direction)
    test = make_synthetic_mil(rng, num_bags=20, direction=direction)

    cfg = tiny_cfg(num_epochs=10, soft_average=False)
    trainer = SnuffyTrainer(cfg)
    runner = Runner(cfg, trainer, train, valid, test, MetricsLogger())
    schedule = cosine_annealing(
        cfg.optim.lr, cfg.num_epochs, cfg.optim.eta_min
    )
    summary = runner.run(schedule)

    first_loss = summary["history"][0]["epoch_train_loss"]
    last_loss = summary["history"][-1]["epoch_train_loss"]
    assert last_loss < first_loss
    assert summary["best_valid_auc"] > 0.75
    assert "test_best" in summary and "test_last" in summary
    test_auc = summary["test_best"]["epoch_test_best_aucs"][0]
    assert test_auc > 0.7


def test_batched_bags_mode_learns():
    """bag_batch_size > 1: one optimizer step per batch of bags; still
    learns the synthetic task and handles ragged tail batches."""
    rng = np.random.default_rng(11)
    direction = rng.standard_normal(32)
    train = make_synthetic_mil(rng, num_bags=30, direction=direction)
    valid = make_synthetic_mil(rng, num_bags=20, direction=direction)
    test = make_synthetic_mil(rng, num_bags=10, direction=direction)

    cfg = tiny_cfg(num_epochs=10, soft_average=False, bag_batch_size=4)
    trainer = SnuffyTrainer(cfg)
    runner = Runner(cfg, trainer, train, valid, test, MetricsLogger())
    schedule = cosine_annealing(cfg.optim.lr, cfg.num_epochs,
                                cfg.optim.eta_min)
    summary = runner.run(schedule)
    assert summary["best_valid_auc"] > 0.7
    assert summary["history"][-1]["epoch_train_loss"] < summary["history"][0][
        "epoch_train_loss"
    ]


def test_compute_pos_weight_matches_reference_elementwise_semantics():
    """Reference utils.py:499-507 accumulates np.clip(label, 0, 1)
    ELEMENTWISE: scalar binary labels give a scalar, one-hot multiclass
    labels give a PER-CLASS vector (a flat sum would collapse TCGA-style
    'every bag positive for one class' to the degenerate scalar 0)."""
    from snuffy_tpu.eval.metrics import compute_pos_weight

    # binary scalars: 3 of 8 positive -> (8-3)/3
    binary = [0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]
    assert np.isclose(compute_pos_weight(binary), 5.0 / 3.0)
    assert np.ndim(compute_pos_weight(binary)) == 0

    # one-hot multiclass: class 0 positive in 2/6, class 1 in 4/6
    onehot = [np.array([1.0, 0.0]), np.array([0.0, 1.0]),
              np.array([0.0, 1.0]), np.array([1.0, 0.0]),
              np.array([0.0, 1.0]), np.array([0.0, 1.0])]
    pw = compute_pos_weight(onehot)
    assert pw.shape == (2,)
    np.testing.assert_allclose(pw, [(6 - 2) / 2, (6 - 4) / 4])

    # Degenerate splits must not emit inf (inf*0 = NaN BCE from step 1):
    # zero positives -> neutral 1.0, scalar and per-class.
    assert compute_pos_weight([0.0, 0.0, 0.0]) == 1.0
    pw0 = compute_pos_weight(
        [np.array([1.0, 0.0]), np.array([1.0, 0.0])]
    )
    np.testing.assert_allclose(pw0, [0.0, 1.0])  # all-pos stays (n-p)/p=0
    assert np.all(np.isfinite(pw0))


def test_unknown_bag_batch_impl_raises():
    """An unknown impl string must fail loudly, not silently run the
    slower vmap path (same silent-downgrade class as the crop_pack
    check in ssl/dino.py)."""
    import pytest

    from snuffy_tpu.configs import MILTrainConfig
    from snuffy_tpu.train.trainer import SnuffyTrainer

    with pytest.raises(ValueError, match="bag_batch_impl"):
        SnuffyTrainer(MILTrainConfig(bag_batch_impl="packd"))


def test_batched_tail_dummy_bags_keep_state_finite():
    """A tail batch padded with all-invalid dummy bags must not poison the
    optimizer state: with -inf masking the dummy bag's attention softmax
    row was 0/0=NaN, and the NaN leaked into the value-projection grads
    through the p·cotangent einsum VJP even though the forward output is
    dropped (found by the recipe-scale parity test; losses.py /
    sparse_attention.py now mask with a large finite negative)."""
    import jax.numpy as jnp

    from snuffy_tpu.configs import (MILTrainConfig, OptimizerConfig,
                                    SnuffyModelConfig)
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=16, num_classes=1, num_heads=2, big_lambda=4,
            random_patch_share=0.5, depth=1, use_pallas=False,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=1e-2),
        soft_average=True, bag_batch_size=4, dataset="camelyon16",
    )
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0)

    rng = np.random.default_rng(0)
    n_pad, batch = 32, 4
    feats = np.zeros((batch, n_pad, 16), np.float32)
    masks = np.zeros((batch, n_pad), bool)
    labels = np.zeros((batch, 1), np.float32)
    bag_w = np.zeros((batch,), np.float32)
    # two real bags, two all-invalid dummies
    for b in range(2):
        feats[b] = rng.standard_normal((n_pad, 16))
        masks[b, : 8 + 4 * b] = True
        labels[b, 0] = float(b)
        bag_w[b] = 1.0

    fn = trainer.train_bucket_batched_fn(n_pad, batch)
    import jax

    state, losses, scores, _ = fn(
        state, jnp.asarray(feats), jnp.asarray(masks), jnp.asarray(labels),
        jnp.asarray(bag_w), jnp.asarray(1e-2, jnp.float32),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(losses)[:2]).all()
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all(), "NaN leaked into params"
    # one more step on real bags only must stay finite too
    state, losses, *_ = fn(
        state, jnp.asarray(feats), jnp.asarray(masks), jnp.asarray(labels),
        jnp.asarray(bag_w), jnp.asarray(1e-2, jnp.float32),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(np.asarray(losses)[:2]).all()


def test_train_step_across_config_grid():
    """One real train step over the reference's config grid corners
    (activation × optimizer × init × multiclass × compute dtype): finite
    loss and params actually move. Exists because a fast suite that only
    trains ONE config can silently lose the others — the r4 q/v fusion
    broke trunc_normal-init configs for a whole round with every fast
    test green (only RUN_SLOW recipe tests init with it)."""
    import itertools

    rng = np.random.default_rng(0)
    grid = itertools.product(
        ("relu", "gelu", "leakyrelu", "selu"),
        ("adam", "adamw"),
        ("trunc_normal", "xavier_uniform"),
    )
    for i, (act, opt, init) in enumerate(grid):
        multiclass = i % 2 == 1  # alternate to keep runtime bounded
        ncls = 2 if multiclass else 1
        cfg = MILTrainConfig(
            model=SnuffyModelConfig(
                feats_size=16, num_classes=ncls, num_heads=2, big_lambda=8,
                random_patch_share=0.25, mlp_multiplier=2, depth=1,
                activation=act, multiclass=multiclass,
                weight_init_i=init, weight_init_b=init, use_pallas=False,
            ),
            optim=OptimizerConfig(optimizer=opt, lr=1e-3,
                                  betas=(0.9, 0.999)),
            soft_average=True, num_epochs=1,
        )
        trainer = SnuffyTrainer(cfg)
        state = trainer.init_state(0, example_n=16)
        fn = trainer.train_bucket_fn(16)
        feats = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
        masks = jnp.asarray(np.ones((2, 16), bool))
        if multiclass:
            labels = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1]])
        else:
            labels = jnp.asarray([[1.0], [0.0]], jnp.float32)
        # materialize BEFORE the step: the step fn donates the state
        before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
        state2, losses, _, _ = fn(state, feats, masks, labels,
                                  jnp.float32(1e-3), jax.random.PRNGKey(1))
        after = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
        assert np.isfinite(np.asarray(losses)).all(), (act, opt, init)
        assert not np.array_equal(before, after), (act, opt, init)


def test_eval_epoch_packed_chunks_match_per_bag_forward():
    """run_eval_epoch evaluates fixed-size packed chunks (EVAL_CHUNK bags
    folded along the row axis, tail chunks padded with masked dummy bags)
    — the per-bag losses/scores/instance probs must equal the chunk=1
    per-bag forward exactly (random share 0 → deterministic selection).
    Pins the chunking/tail-slicing logic that replaced the whole-bucket
    vmap (whose compile time exploded with bucket size)."""
    import dataclasses

    model = SnuffyModelConfig(
        feats_size=32, num_classes=1, num_heads=2, big_lambda=8,
        random_patch_share=0.0, mlp_multiplier=2,
        encoder_dropout=0.0, attention_dropout=0.0, depth=1,
        use_pallas=False,
    )
    cfg = dataclasses.replace(tiny_cfg(), model=model)
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0)

    rng = np.random.default_rng(5)
    # 11 same-ish-length bags → one bucket of >EVAL_CHUNK (tail chunk of 3)
    labels, feats, *_ = make_synthetic_mil(rng, num_bags=11, d=32,
                                           n_lo=20, n_hi=24)
    bucketed = bucket_bags(labels, feats, rng=rng)
    losses, scores, ins_list, order = trainer.run_eval_epoch(
        state, bucketed, seed=7
    )
    assert len(order) == 11 and len(ins_list) == 11

    group = {"model": state.params, "w": state.w}
    oracle = {}
    for n_pad, (fb, mb, lb, idx) in bucketed.items():
        fn = trainer.eval_bucket_fn(n_pad, 1)
        for b in range(len(idx)):
            l, s, ins = fn(
                group, jnp.asarray(fb[b:b + 1]), jnp.asarray(mb[b:b + 1]),
                jnp.asarray(lb[b:b + 1]), jax.random.PRNGKey(0),
            )
            n_valid = int(mb[b].sum())
            oracle[int(idx[b])] = (
                float(np.asarray(l).reshape(-1)[0]),
                np.asarray(s).reshape(-1),
                np.asarray(ins)[0, :n_valid],
            )
    for pos, bag_idx in enumerate(order):
        l_ref, s_ref, ins_ref = oracle[bag_idx]
        np.testing.assert_allclose(losses[pos], l_ref, atol=1e-5)
        np.testing.assert_allclose(scores[pos], s_ref, atol=1e-5)
        np.testing.assert_allclose(ins_list[pos], ins_ref, atol=1e-5)
