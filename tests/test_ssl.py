"""SSL trainers: DINO-adapter and MAE-adapter steps on tiny models —
freeze semantics, EMA teacher, center updates, finite losses, augmentations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.models.mae import MaskedAutoencoderViT
from snuffy_tpu.models.vit import VisionTransformer
from snuffy_tpu.ssl.augment import dino_multicrop_batch
from snuffy_tpu.ssl.dino import DINOTrainer
from snuffy_tpu.ssl.mae_trainer import (
    MAETrainer,
    effective_lr,
    host_check_finite,
    mae_trainable_mask,
    no_decay_mask,
)
from snuffy_tpu.ssl.schedules import cosine_iter_schedule, mae_lr_schedule


def tiny_backbone():
    return VisionTransformer(
        patch_size=8, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
        use_adapter=True, adapter_bottleneck=4, output="cls",
    )


def _flat(tree):
    return {
        "/".join(str(p.key) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_dino_step_freeze_and_ema():
    trainer = DINOTrainer(
        tiny_backbone(), out_dim=64, n_local_crops=2,
        local_size=16, global_size=32, freeze_backbone=True,
        head_hidden_dim=32, head_bottleneck_dim=16,
    )
    state = trainer.init_state(0)
    step = trainer.get_step()

    rng = np.random.default_rng(0)
    b = 2
    globals_ = jnp.asarray(rng.normal(size=(2, b, 32, 32, 3)), jnp.float32)
    locals_ = jnp.asarray(rng.normal(size=(2, b, 16, 16, 3)), jnp.float32)

    before = _flat(state.student)
    teacher_before = _flat(state.teacher)  # snapshot pre-donation
    state2, loss = step(
        state, globals_, locals_,
        jnp.asarray(1e-3), jnp.asarray(0.04), jnp.asarray(0.99),
        jnp.asarray(0.04), jnp.asarray(True), jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss))
    after = _flat(state2.student)

    frozen_moved, adapter_moved, head_moved = [], [], []
    for k in before:
        moved = not np.allclose(before[k], after[k])
        if "adaptmlp" in k:
            adapter_moved.append(moved)
        elif k.startswith("head/"):
            head_moved.append(moved)
        else:
            frozen_moved.append(moved)
    assert not any(frozen_moved), "frozen backbone params moved"
    assert any(adapter_moved), "adapter params did not move"
    assert any(head_moved), "head params did not move"
    # last_layer grads cancelled → last_layer_v unchanged
    np.testing.assert_allclose(
        before["head/last_layer_v"], after["head/last_layer_v"]
    )
    # teacher EMA: teacher moved toward student but is not equal to it
    t_after = _flat(state2.teacher)
    assert any(
        not np.allclose(t_after[k], teacher_before[k])
        for k in t_after if "adaptmlp" in k
    )
    # center was updated
    assert not np.allclose(np.asarray(state2.center), 0.0)


@pytest.mark.parametrize("opt", ["sgd", "lars"])
def test_dino_optimizer_choices(opt):
    """The reference's non-default optimizers (main_dino_adapter.py:352-359)
    run a real step: finite loss, trainable params move, frozen stay put."""
    trainer = DINOTrainer(
        tiny_backbone(), out_dim=32, n_local_crops=2,
        local_size=16, global_size=32, freeze_backbone=True,
        head_hidden_dim=32, head_bottleneck_dim=16, optimizer=opt,
    )
    state = trainer.init_state(0)
    step = trainer.get_step()
    rng = np.random.default_rng(1)
    globals_ = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)), jnp.float32)
    locals_ = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 3)), jnp.float32)

    before = _flat(state.student)
    state2, loss = step(
        state, globals_, locals_,
        jnp.asarray(1e-2), jnp.asarray(0.04), jnp.asarray(0.99),
        jnp.asarray(0.04), jnp.asarray(False), jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))
    after = _flat(state2.student)
    moved = {k: not np.allclose(before[k], after[k]) for k in before}
    assert any(m for k, m in moved.items() if "adaptmlp" in k)
    assert any(m for k, m in moved.items() if k.startswith("head/"))
    assert not any(
        m for k, m in moved.items()
        if "adaptmlp" not in k and not k.startswith("head/")
    )


def test_dino_optimizer_unknown_raises():
    with pytest.raises(KeyError):
        DINOTrainer(tiny_backbone(), out_dim=8, optimizer="lamb")


def test_dino_teacher_temp_warmup():
    trainer = DINOTrainer(
        tiny_backbone(), out_dim=8, warmup_teacher_temp=0.01,
        teacher_temp=0.05, warmup_teacher_temp_epochs=10,
    )
    assert trainer.teacher_temp_at(0) == pytest.approx(0.01)
    assert trainer.teacher_temp_at(5) == pytest.approx(0.03)
    assert trainer.teacher_temp_at(10) == pytest.approx(0.05)
    assert trainer.teacher_temp_at(50) == pytest.approx(0.05)


def test_mae_trainer_freeze_and_loss():
    model = MaskedAutoencoderViT(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, use_adapter=True, adapter_bottleneck=4,
    )
    trainer = MAETrainer(model, mask_ratio=0.5, freeze_non_adapter=True,
                         train_decoder_linears=True, use_bf16=False)
    state = trainer.init_state(0)
    step = trainer.get_step()

    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    before = _flat(state.params)
    state2, loss = step(state, imgs, jnp.asarray(1e-3), jax.random.PRNGKey(0))
    host_check_finite(float(loss))
    after = _flat(state2.params)

    for k in before:
        moved = not np.allclose(before[k], after[k])
        if "adaptmlp" in k or k.startswith(("decoder_embed/", "decoder_pred/")):
            continue  # allowed to move
        assert not moved, f"frozen param {k} moved"
    assert any(
        not np.allclose(before[k], after[k]) for k in before if "adaptmlp" in k
    )
    assert any(
        not np.allclose(before[k], after[k])
        for k in before if k.startswith("decoder_pred/")
    )


def test_mae_nan_guard():
    with pytest.raises(FloatingPointError):
        host_check_finite(float("nan"))


def test_schedules():
    sched = cosine_iter_schedule(1.0, 0.1, epochs=10, iters_per_epoch=10,
                                 warmup_epochs=2)
    assert sched(0) == pytest.approx(0.0)
    assert sched(10) == pytest.approx(0.5)
    assert sched(20) == pytest.approx(1.0)
    assert sched(100) == pytest.approx(0.1)
    lr = mae_lr_schedule(1.0, 0.0, epochs=10, warmup_epochs=2)
    assert lr(1.0) == pytest.approx(0.5)
    assert lr(2.0) == pytest.approx(1.0)
    assert lr(10.0) == pytest.approx(0.0, abs=1e-9)
    assert effective_lr(1e-3, 256) == pytest.approx(1e-3)
    assert effective_lr(1e-3, 256, n_devices=4) == pytest.approx(4e-3)


def test_multicrop_shapes_and_stats():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    g, l = dino_multicrop_batch(
        jax.random.PRNGKey(0), imgs, n_local=3, global_size=32, local_size=16
    )
    assert g.shape == (2, 2, 32, 32, 3)
    assert l.shape == (3, 2, 16, 16, 3)
    assert np.isfinite(np.asarray(g)).all() and np.isfinite(np.asarray(l)).all()
    # normalized outputs: roughly centered
    assert abs(float(jnp.mean(g))) < 3.0


def test_knn_classify_separable():
    from snuffy_tpu.ssl.retrieval import knn_classify

    rng = np.random.default_rng(0)
    c0 = rng.normal(size=(50, 8)) + np.array([3.0] + [0] * 7)
    c1 = rng.normal(size=(50, 8)) - np.array([3.0] + [0] * 7)
    train = np.concatenate([c0, c1])
    labels = np.array([0] * 50 + [1] * 50)
    test = np.concatenate([
        rng.normal(size=(10, 8)) + np.array([3.0] + [0] * 7),
        rng.normal(size=(10, 8)) - np.array([3.0] + [0] * 7),
    ])
    pred = knn_classify(train, labels, test, k=10)
    assert (pred == np.array([0] * 10 + [1] * 10)).mean() > 0.9


def test_pca_whitening_decorrelates():
    from snuffy_tpu.ssl.retrieval import PCA

    rng = np.random.default_rng(1)
    base = rng.normal(size=(500, 4))
    mix = rng.normal(size=(4, 8))
    x = base @ mix  # rank-4 correlated data in 8-d
    pca = PCA(dim=4, whit=0.5)
    pca.train_pca(x)
    y = pca.apply(x)
    assert y.shape == (500, 4)
    cov = np.cov(y.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.15 * np.abs(np.diag(cov)).max()


def test_map_perfect_and_worst():
    from snuffy_tpu.ssl.retrieval import compute_ap, retrieval_map

    # positives ranked first → AP 1
    assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)
    # single positive at rank 9 of 10 → low AP
    assert compute_ap(np.array([9]), 1) < 0.2

    rng = np.random.default_rng(2)
    db = np.concatenate([
        rng.normal(size=(5, 6)) + 4.0, rng.normal(size=(5, 6)) - 4.0
    ])
    queries = np.stack([db[0] + 0.1, db[7] + 0.1])
    positives = [set(range(5)), set(range(5, 10))]
    m = retrieval_map(queries, db, positives)
    assert m > 0.95


def test_truncate_log_past_epoch(tmp_path):
    """Resume dedup: rows from epochs ≥ the resume epoch are dropped, rows
    without an epoch key and unparsable lines survive."""
    from snuffy_tpu.utils.logging import truncate_log_past_epoch

    p = tmp_path / "log.txt"
    rows = [
        '{"epoch": 0, "train_loss": 1.0}',
        '{"epoch": 1, "train_loss": 0.9}',
        '{"note": "no epoch field"}',
        "not json at all",
        '{"epoch": 2, "train_loss": 0.8}',
        '{"epoch": 3, "train_loss": 0.7}',
    ]
    p.write_text("\n".join(rows) + "\n")
    dropped = truncate_log_past_epoch(str(p), resume_epoch=2)
    assert dropped == 2
    lines = p.read_text().splitlines()
    assert len(lines) == 4
    assert '"epoch": 2' not in p.read_text()
    assert "not json at all" in lines
    # idempotent + missing file is a no-op
    assert truncate_log_past_epoch(str(p), 2) == 0
    assert truncate_log_past_epoch(str(tmp_path / "none.txt"), 2) == 0


def test_dino_use_bn_in_head():
    """--use_bn_in_head (reference main_dino_adapter.py:91 + DINOHead BN
    layers, vision_transformer_with_adapter.py:289-294): BN params train,
    running stats update on the train step, eval uses running averages."""
    trainer = DINOTrainer(
        tiny_backbone(), out_dim=32, n_local_crops=2,
        local_size=16, global_size=32, freeze_backbone=True,
        head_hidden_dim=32, head_bottleneck_dim=16, use_bn_in_head=True,
    )
    state = trainer.init_state(0)
    assert set(state.bn_stats["student"]) == {"bn_0", "bn_1"}
    assert np.allclose(
        np.asarray(state.bn_stats["student"]["bn_0"]["mean"]), 0.0
    )
    step = trainer.get_step()
    rng = np.random.default_rng(3)
    globals_ = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)), jnp.float32)
    locals_ = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 3)), jnp.float32)
    state2, loss = step(
        state, globals_, locals_,
        jnp.asarray(1e-3), jnp.asarray(0.04), jnp.asarray(0.99),
        jnp.asarray(0.04), jnp.asarray(False), jax.random.PRNGKey(4),
    )
    assert np.isfinite(float(loss))
    # both student AND teacher running stats moved (torch modules left in
    # train mode update running stats on every forward)
    for net in ("student", "teacher"):
        assert not np.allclose(
            np.asarray(state2.bn_stats[net]["bn_0"]["mean"]), 0.0
        ), net
    assert np.isfinite(trainer.eval_loss(state2, globals_, locals_, 0.04))


def test_dino_adamw_decay_exempts_1d_params():
    """get_params_groups exempts every 1-d param from weight decay
    (reference dino_adapter/utils.py:648-659): with norm_last_layer=False,
    last_layer_g and biases must take identical steps at wd=0 and wd=10,
    while 2-d head kernels must not."""
    def run(wd):
        trainer = DINOTrainer(
            tiny_backbone(), out_dim=32, n_local_crops=2,
            local_size=16, global_size=32, freeze_backbone=True,
            head_hidden_dim=32, head_bottleneck_dim=16,
            norm_last_layer=False,
        )
        state = trainer.init_state(0)
        step = trainer.get_step()
        rng = np.random.default_rng(5)
        globals_ = jnp.asarray(rng.normal(size=(2, 2, 32, 32, 3)), jnp.float32)
        locals_ = jnp.asarray(rng.normal(size=(2, 2, 16, 16, 3)), jnp.float32)
        state2, _ = step(
            state, globals_, locals_,
            jnp.asarray(1e-2), jnp.asarray(wd), jnp.asarray(0.99),
            jnp.asarray(0.04), jnp.asarray(False), jax.random.PRNGKey(6),
        )
        return _flat(state2.student)

    a, b = run(0.0), run(10.0)
    np.testing.assert_allclose(a["head/last_layer_g"], b["head/last_layer_g"])
    np.testing.assert_allclose(a["head/mlp_0/bias"], b["head/mlp_0/bias"])
    assert not np.allclose(a["head/mlp_0/kernel"], b["head/mlp_0/kernel"])


def test_mae_step_accepts_uint8():
    """uint8 batches are the host→device contract; the step normalizes on
    device and must match the prescaled float path exactly."""
    model = MaskedAutoencoderViT(
        img_size=32, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, use_adapter=True, adapter_bottleneck=4,
    )
    trainer = MAETrainer(model, mask_ratio=0.5, use_bf16=False)
    state = trainer.init_state(0)
    step = trainer.get_step()
    imgs = np.random.default_rng(7).integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    s_u8, loss_u8 = step(state, jnp.asarray(imgs), jnp.asarray(1e-3),
                         jax.random.PRNGKey(8))
    state2 = trainer.init_state(0)
    s_f, loss_f = step(state2, jnp.asarray(imgs, jnp.float32) / 255.0,
                       jnp.asarray(1e-3), jax.random.PRNGKey(8))
    np.testing.assert_allclose(float(loss_u8), float(loss_f), rtol=1e-6)
    assert np.isfinite(trainer.eval_loss(s_u8, imgs, jax.random.PRNGKey(9)))


def test_vit_pack_forward_parity():
    """Crop packing (VERDICT r3 item 3): folding pack=4 images into one
    block-diagonal-masked sequence is the SAME math as the plain batched
    forward — CLS outputs agree to float noise (masked softmax weights
    underflow to exact zeros; only summation order differs)."""
    vit = tiny_backbone()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), x[:1], True)["params"]
    plain = vit.apply({"params": params}, x, True)
    packed = vit.apply({"params": params}, x, True, pack=4)
    assert packed.shape == plain.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError):
        vit.apply({"params": params}, x[:6], True, pack=4)


def test_vit_pack_blocked_mode_parity():
    """pack_mode='blocked' (VERDICT r4 item 2): folding segments into the
    attention batch dim instead of masking is the same math again — both
    modes agree with the plain batched forward, and with each other."""
    kw = dict(patch_size=8, embed_dim=32, depth=2, num_heads=2,
              mlp_ratio=2.0, use_adapter=True, adapter_bottleneck=4,
              output="cls")
    vit_m = VisionTransformer(pack_mode="masked", **kw)
    vit_b = VisionTransformer(pack_mode="blocked", **kw)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    params = vit_m.init(jax.random.PRNGKey(0), x[:1], True)["params"]
    plain = vit_m.apply({"params": params}, x, True)
    blocked = vit_b.apply({"params": params}, x, True, pack=4)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)


def test_mae_pack_blocked_mode_parity():
    """MAE encoder pack_mode='blocked' reproduces the unpacked loss/pred
    like the masked mode does (same masking rng, decoder untouched)."""
    kw = dict(img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
              decoder_embed_dim=24, decoder_depth=1, decoder_num_heads=2,
              use_adapter=True, adapter_bottleneck=4)
    m_plain = MaskedAutoencoderViT(**kw)
    m_blocked = MaskedAutoencoderViT(pack_mode="blocked", **kw)
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    k = jax.random.PRNGKey(0)
    params = m_plain.init({"params": k, "masking": k}, imgs, 0.75, True
                          )["params"]
    mask_rng = jax.random.PRNGKey(11)
    l1, p1, m1 = m_plain.apply({"params": params}, imgs, 0.75, True,
                               mask_rng)
    l2, p2, m2 = m_blocked.apply({"params": params}, imgs, 0.75, True,
                                 mask_rng, pack=2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-5, atol=2e-5)
    assert abs(float(l1) - float(l2)) < 1e-5


def test_dino_crop_pack_step_parity():
    """A DINOTrainer with crop_pack=2 computes the same deterministic loss
    as the unpacked trainer (eval path: same math, no dropout draws), and
    its TRAIN step — where the dropout/droppath masks legitimately differ
    because the packed shapes fold the rng differently — still trains:
    finite loss in the unpacked loss's neighborhood, adapters move,
    frozen backbone stays put."""
    kw = dict(out_dim=64, n_local_crops=2, local_size=16, global_size=32,
              freeze_backbone=True, head_hidden_dim=32,
              head_bottleneck_dim=16)
    t1 = DINOTrainer(tiny_backbone(), **kw)
    t2 = DINOTrainer(tiny_backbone(), crop_pack=2, **kw)
    s1 = t1.init_state(0)
    s2 = t2.init_state(0)

    rng = np.random.default_rng(1)
    b = 2
    g = jnp.asarray(rng.normal(size=(2, b, 32, 32, 3)), jnp.float32)
    l = jnp.asarray(rng.normal(size=(2, b, 16, 16, 3)), jnp.float32)

    e1 = t1.eval_loss(s1, g, l, 0.04)
    e2 = t2.eval_loss(s2, g, l, 0.04)
    assert abs(e1 - e2) < 1e-4, (e1, e2)

    args = (jnp.asarray(1e-3), jnp.asarray(0.04), jnp.asarray(0.99),
            jnp.asarray(0.04), jnp.asarray(True), jax.random.PRNGKey(3))
    before = _flat(s2.student)
    s2b, loss2 = t2.get_step()(s2, g, l, *args)
    assert np.isfinite(float(loss2))
    assert abs(float(loss2) - e2) < 1.0  # dropout-noise neighborhood
    after = _flat(s2b.student)
    assert any("adaptmlp" in k and not np.allclose(before[k], after[k])
               for k in before)
    assert all(np.allclose(before[k], after[k]) for k in before
               if "adaptmlp" not in k and not k.startswith("head/"))


def test_mae_pack_forward_parity():
    """MAE encoder packing: pack=2 with the same masking rng reproduces the
    unpacked loss/pred to float noise (decoder is untouched)."""
    model = MaskedAutoencoderViT(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        decoder_embed_dim=24, decoder_depth=1, decoder_num_heads=2,
        use_adapter=True, adapter_bottleneck=4,
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "masking": k}, imgs, 0.75, True
                        )["params"]
    mask_rng = jax.random.PRNGKey(7)
    l1, p1, m1 = model.apply({"params": params}, imgs, 0.75, True, mask_rng)
    l2, p2, m2 = model.apply({"params": params}, imgs, 0.75, True, mask_rng,
                             pack=2)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=2e-5, atol=2e-5)
    assert abs(float(l1) - float(l2)) < 1e-5
    with pytest.raises(ValueError):
        model.apply({"params": params}, imgs[:3], 0.75, True, mask_rng,
                    pack=2)
