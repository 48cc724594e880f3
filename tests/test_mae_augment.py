"""Device-side MAE pretraining augmentation (reference
mae_adapter/main_pretrain_adapter.py:155-161 transform_train =
RandomResizedCrop(input_size, scale=(0.2,1.0), bicubic) + hflip +
ImageNet normalize, applied to train AND validation splits; crop-param
sampling per mae_adapter/util/crop.py:23-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.ssl.augment import (
    _cubic_sample,
    mae_train_augment,
    random_hflip,
    random_resized_crop,
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def test_cubic_sampler_reproduces_linear_ramp():
    """Keys a=-0.5 cubic reproduces degree-1 polynomials exactly on
    interior taps."""
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = jnp.asarray(
        np.stack([yy / (h - 1), xx / (w - 1), 0.5 * np.ones_like(yy)],
                 axis=-1), jnp.float32)
    # interior grid: all 4 taps in range
    ys = jnp.linspace(2.3, 28.7, 9)
    xs = jnp.linspace(1.9, 29.1, 9)
    out = np.asarray(_cubic_sample(img, ys, xs))
    np.testing.assert_allclose(
        out[..., 0], np.asarray(ys)[:, None] / (h - 1) * np.ones((1, 9)),
        atol=1e-5)
    np.testing.assert_allclose(
        out[..., 1], np.asarray(xs)[None, :] / (w - 1) * np.ones((9, 1)),
        atol=1e-5)
    np.testing.assert_allclose(out[..., 2], 0.5, atol=1e-5)


def _reference_crop_params(rng, h, w, scale, ratio, n):
    """numpy reimplementation of the BYOL-style sampler the reference MAE
    uses (mae_adapter/util/crop.py:23-42): area and log-aspect sampled
    once, sides rounded and clamped to the image."""
    area = h * w
    ta = area * rng.uniform(scale[0], scale[1], n)
    ar = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]), n))
    cw = np.minimum(np.round(np.sqrt(ta * ar)), w)
    ch = np.minimum(np.round(np.sqrt(ta / ar)), h)
    return ch, cw


def test_crop_distribution_matches_reference_formula():
    """Recover (ch, cw) from linear-ramp images (bicubic is exact on
    ramps) and compare the crop-size distribution against the reference
    formula's."""
    h = w = 64
    out_size = 16
    scale = (0.2, 1.0)
    ratio = (3 / 4, 4 / 3)
    n = 2000
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = jnp.asarray(
        np.stack([yy / (h - 1), xx / (w - 1), np.zeros_like(yy)], axis=-1),
        jnp.float32)

    crop = jax.jit(jax.vmap(
        lambda k: random_resized_crop(k, img, out_size, scale=scale,
                                      ratio=ratio, method="bicubic")
    ))
    outs = np.asarray(crop(jax.random.split(jax.random.PRNGKey(0), n)))
    # interior rows/cols avoid edge-clamp nonlinearity:
    # ys[i] = y0 + (ch-1) * i/(out_size-1)
    i1, i2 = 5, 10
    ch = ((outs[:, i2, i1, 0] - outs[:, i1, i1, 0]) * (h - 1)
          * (out_size - 1) / (i2 - i1)) + 1.0
    cw = ((outs[:, i1, i2, 1] - outs[:, i1, i1, 1]) * (w - 1)
          * (out_size - 1) / (i2 - i1)) + 1.0
    assert np.all(ch > 0) and np.all(cw > 0)

    ref_ch, ref_cw = _reference_crop_params(
        np.random.default_rng(1), h, w, scale, ratio, n)
    # distribution match within sampling noise (means within ~2%, stds
    # within ~10% of the image side)
    assert abs(ch.mean() - ref_ch.mean()) < 0.02 * h
    assert abs(cw.mean() - ref_cw.mean()) < 0.02 * w
    assert abs(ch.std() - ref_ch.std()) < 0.1 * ref_ch.std() + 1.0
    assert abs(cw.std() - ref_cw.std()) < 0.1 * ref_cw.std() + 1.0
    # area fraction respects the scale bounds (up to rounding/clip slack)
    frac = ch * cw / (h * w)
    assert frac.min() > scale[0] * 0.8
    assert frac.max() <= 1.01


def test_hflip_rate_is_half():
    img = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)),
                      jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(3), 2000)
    flipped = jax.vmap(lambda k: random_hflip(k, img))(keys)
    is_flipped = np.asarray(
        jnp.all(flipped == img[:, ::-1, :], axis=(1, 2, 3)))
    rate = is_flipped.mean()
    assert 0.45 < rate < 0.55


def test_mae_train_augment_normalizes_and_shapes():
    """Constant image: crop/flip invariant → output is exactly the
    ImageNet-normalized constant, at the static out size."""
    b, raw, out = 4, 48, 32
    img = np.full((b, raw, raw, 3), 0.5, np.float32)
    y = np.asarray(mae_train_augment(jax.random.PRNGKey(0),
                                     jnp.asarray(img), out))
    assert y.shape == (b, out, out, 3)
    expect = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(y, np.broadcast_to(expect, y.shape),
                               atol=1e-4)
    # per-image randomness: distinct images get distinct crops
    ramp = np.broadcast_to(
        np.linspace(0, 1, raw, dtype=np.float32)[None, :, None, None],
        (b, raw, raw, 3)).copy()
    y2 = np.asarray(mae_train_augment(jax.random.PRNGKey(1),
                                      jnp.asarray(ramp), out))
    assert not np.allclose(y2[0], y2[1])


def _tiny_mae(img_size=32):
    from snuffy_tpu.models.mae import MaskedAutoencoderViT

    return MaskedAutoencoderViT(
        img_size=img_size, patch_size=8, embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, mlp_ratio=2.0, use_adapter=True,
    )


def test_mae_step_with_augment_crops_raw_feed():
    """augment=True: uint8 batches at the RAW decode size train the
    img_size model; loss finite; adapter params move."""
    from snuffy_tpu.ssl.mae_trainer import MAEState, MAETrainer

    trainer = MAETrainer(_tiny_mae(32), augment=True, use_bf16=False)
    state = trainer.init_state(0)
    step = trainer.get_step()
    imgs = np.random.default_rng(0).integers(
        0, 256, (4, 48, 48, 3), dtype=np.uint8)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    new_state, loss = step(state, jnp.asarray(imgs),
                           jnp.asarray(1e-3, jnp.float32),
                           jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        p0, new_state.params)
    assert any(l for l in jax.tree_util.tree_leaves(moved))
    # eval path augments too (the reference validates through
    # transform_train, main_pretrain_adapter.py:161)
    l1 = trainer.eval_loss(new_state, imgs, jax.random.PRNGKey(1))
    l2 = trainer.eval_loss(new_state, imgs, jax.random.PRNGKey(2))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l1 != l2  # different crops/masks → different val loss


def test_mae_step_without_augment_unchanged():
    """augment=False keeps the pre-aug contract: images already at
    img_size, scaled to [0,1], no ImageNet normalize."""
    from snuffy_tpu.ssl.mae_trainer import MAETrainer

    trainer = MAETrainer(_tiny_mae(32), augment=False, use_bf16=False)
    state = trainer.init_state(0)
    step = trainer.get_step()
    imgs = np.random.default_rng(0).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8)
    _, loss = step(state, jnp.asarray(imgs),
                   jnp.asarray(1e-3, jnp.float32), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_mae_cli_raw_input_size(tmp_path, monkeypatch):
    """CLI smoke: --device_augment 1 --raw_input_size 48 feeds 48px
    decodes into 32px crops on the virtual mesh."""
    from PIL import Image

    from snuffy_tpu.models import mae as mae_mod

    def tiny(**kw):
        kw.pop("patch_size", None)
        return mae_mod.MaskedAutoencoderViT(
            patch_size=8, embed_dim=32, depth=1, num_heads=2,
            decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, **kw)

    monkeypatch.setattr(mae_mod, "mae_vit_base_patch16", tiny)

    import main_pretrain_adapter as cli

    data = tmp_path / "imgs" / "cls"
    data.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(str(data / f"{i}.jpg"))
    args = cli.get_args_parser().parse_args([
        "--model=mae_vit_base_patch16", "--epochs=1", "--batch_size=1",
        f"--data_path={tmp_path}/imgs", f"--output_dir={tmp_path}/out",
        "--num_workers=0", "--input_size=32", "--raw_input_size=48",
        "--device_augment=1", "--warmup_epochs=1",
        "--max_steps_per_epoch=2",
    ])
    state = cli.train_mae(args)
    assert int(np.asarray(state.step)) == 2
