"""Device-side image augmentations for SSL multi-crop pipelines.

The reference's DataAugmentationDINO runs PIL transforms on CPU workers
(reference dino_adapter/main_dino_adapter.py:674-719: 2 global 224 crops +
N local 96 crops with jitter/grayscale/blur/solarize). TPU-first redesign:
augmentations are pure jnp functions vmapped over the batch and fused by
XLA — the host only streams decoded uint8 images; crops never touch the
host again. All shapes static; randomness from `jax.random` keys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,      # (H, W, 3) float [0,1]
    out_size: int,
    scale: Tuple[float, float] = (0.4, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    method: str = "bilinear",
) -> jnp.ndarray:
    """Area-scaled random crop + resize (torchvision RandomResizedCrop
    semantics, jit-static output size). Crop-parameter sampling is the
    BYOL/MAE one-shot form (reference mae_adapter/util/crop.py:23-42:
    area and aspect sampled once, sides clamped to the image — no
    torchvision retry loop), which torchvision matches in distribution
    whenever the clamp doesn't bind. `method` is 'bilinear' or 'bicubic'
    (the MAE recipe uses bicubic, main_pretrain_adapter.py:156)."""
    h, w = img.shape[0], img.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    ch = jnp.sqrt(area / r)
    cw = jnp.sqrt(area * r)
    ch = jnp.clip(ch, 8.0, h).astype(jnp.float32)
    cw = jnp.clip(cw, 8.0, w).astype(jnp.float32)
    y0 = jax.random.uniform(k3, ()) * (h - ch)
    x0 = jax.random.uniform(k4, ()) * (w - cw)
    # Sample a static out_size×out_size grid over the crop window.
    ys = y0 + (ch - 1) * jnp.linspace(0.0, 1.0, out_size)
    xs = x0 + (cw - 1) * jnp.linspace(0.0, 1.0, out_size)
    if method == "bicubic":
        return _cubic_sample(img, ys, xs)
    return _bilinear_sample(img, ys, xs)


def _bilinear_sample(img, ys, xs):
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    a = img[y0][:, x0]
    b = img[y0][:, x1]
    c = img[y1][:, x0]
    d = img[y1][:, x1]
    return (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + c * wy * (1 - wx)
        + d * wy * wx
    )


def _cubic_weights(t):
    """Keys cubic kernel, a=-0.5 (PIL BICUBIC): weights for taps at
    offsets (-1, 0, 1, 2) given fractional position t in [0, 1).
    Reproduces degree-≤1 polynomials exactly."""
    a = -0.5
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t])   # |x| per tap
    near = (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0
    far = a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a
    return jnp.where(d <= 1.0, near, far)


def _cubic_sample(img, ys, xs):
    """Separable 4×4-tap bicubic grid sample with edge clamping."""
    h, w = img.shape[0], img.shape[1]
    yb = jnp.floor(ys).astype(jnp.int32)
    xb = jnp.floor(xs).astype(jnp.int32)
    wy = _cubic_weights(ys - yb)            # (4, out)
    wx = _cubic_weights(xs - xb)            # (4, out)
    out = 0.0
    for i in range(4):
        yi = jnp.clip(yb + (i - 1), 0, h - 1)
        rows = img[yi]                       # (out, W, C)
        row_acc = 0.0
        for j in range(4):
            xj = jnp.clip(xb + (j - 1), 0, w - 1)
            row_acc = row_acc + rows[:, xj] * wx[j][None, :, None]
        out = out + row_acc * wy[i][:, None, None]
    return out


def random_hflip(key, img, p=0.5):
    return jnp.where(jax.random.bernoulli(key, p), img[:, ::-1, :], img)


def color_jitter(key, img, brightness=0.4, contrast=0.4, saturation=0.2,
                 hue=0.1, p=0.8):
    """Brightness/contrast/saturation/hue jitter applied with probability p
    (torchvision ColorJitter semantics, approximate hue rotation)."""
    ka, kb, kc, kd, ke = jax.random.split(key, 5)

    def jitter(img):
        b = 1.0 + jax.random.uniform(ka, (), minval=-brightness, maxval=brightness)
        out = img * b
        c = 1.0 + jax.random.uniform(kb, (), minval=-contrast, maxval=contrast)
        mean = out.mean()
        out = (out - mean) * c + mean
        s = 1.0 + jax.random.uniform(kc, (), minval=-saturation, maxval=saturation)
        gray = out.mean(axis=-1, keepdims=True)
        out = (out - gray) * s + gray
        hshift = jax.random.uniform(kd, (), minval=-hue, maxval=hue)
        out = out + hshift * _hue_direction(out)
        return jnp.clip(out, 0.0, 1.0)

    return jnp.where(jax.random.bernoulli(ke, p), jitter(img), img)


def _hue_direction(img):
    """First-order hue rotation direction (channel roll difference)."""
    return jnp.roll(img, 1, axis=-1) - img


def random_grayscale(key, img, p=0.2):
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    gray3 = jnp.stack([gray] * 3, axis=-1)
    return jnp.where(jax.random.bernoulli(key, p), gray3, img)


def gaussian_blur(key, img, p=0.5, sigma_range=(0.1, 2.0), kernel_size=9):
    """Separable gaussian blur with random sigma, applied with prob p
    (reference dino_adapter/utils.py:39-56)."""
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(
        k1, (), minval=sigma_range[0], maxval=sigma_range[1]
    )
    half = kernel_size // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (xs / sigma) ** 2)
    g = g / g.sum()

    def blur(img):
        # (H, W, C): convolve rows then cols per channel.
        padded = jnp.pad(img, ((half, half), (0, 0), (0, 0)), mode="edge")
        rows = sum(
            padded[i : i + img.shape[0]] * g[i] for i in range(kernel_size)
        )
        padded = jnp.pad(rows, ((0, 0), (half, half), (0, 0)), mode="edge")
        return sum(
            padded[:, i : i + img.shape[1]] * g[i] for i in range(kernel_size)
        )

    return jnp.where(jax.random.bernoulli(k2, p), blur(img), img)


def solarization(key, img, p=0.2, threshold=0.5):
    """Invert pixels above threshold with prob p (reference
    dino_adapter/utils.py:59-74)."""
    sol = jnp.where(img >= threshold, 1.0 - img, img)
    return jnp.where(jax.random.bernoulli(key, p), sol, img)


def normalize(img, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    return (img - jnp.asarray(mean)) / jnp.asarray(std)


def dino_global_crop(key, img, out_size=224, blur_p=1.0, solar_p=0.0):
    """One DINO global view (reference main_dino_adapter.py:674-719)."""
    k = jax.random.split(key, 6)
    x = random_resized_crop(k[0], img, out_size, scale=(0.4, 1.0))
    x = random_hflip(k[1], x)
    x = color_jitter(k[2], x)
    x = random_grayscale(k[3], x)
    x = gaussian_blur(k[4], x, p=blur_p)
    x = solarization(k[5], x, p=solar_p)
    return normalize(x)


def dino_local_crop(key, img, out_size=96):
    k = jax.random.split(key, 5)
    x = random_resized_crop(k[0], img, out_size, scale=(0.05, 0.4))
    x = random_hflip(k[1], x)
    x = color_jitter(k[2], x)
    x = random_grayscale(k[3], x)
    x = gaussian_blur(k[4], x, p=0.5)
    return normalize(x)


def mae_train_augment(key, images, out_size, scale=(0.2, 1.0)):
    """The MAE-adapter pretraining transform, device-side: per-image
    RandomResizedCrop(out_size, scale=(0.2, 1.0), bicubic) + hflip(0.5)
    + ImageNet normalize (reference mae_adapter/main_pretrain_adapter.py:
    155-159 — `transform_train`, which the reference applies to BOTH the
    train and validation ImageFolders, line 161).

    images: (B, H, W, 3) float in [0, 1] (any static H, W — the crop
    window is taken from the raw decode, like torchvision cropping the
    original PIL image). Returns (B, out_size, out_size, 3) normalized.
    """

    def one(k, img):
        k1, k2 = jax.random.split(k)
        x = random_resized_crop(k1, img, out_size, scale=scale,
                                method="bicubic")
        x = random_hflip(k2, x)
        return normalize(x)

    b = images.shape[0]
    return jax.vmap(one)(jax.random.split(key, b), images)


def dino_multicrop_batch(key, images, n_local=8, global_size=224,
                         local_size=96):
    """(B, H, W, 3) → (globals (2, B, gs, gs, 3), locals (n, B, ls, ls, 3)).
    The two global views differ in blur/solarize probabilities like the
    reference's first/second global transforms."""
    kg1, kg2, kl = jax.random.split(key, 3)
    b = images.shape[0]
    g1 = jax.vmap(
        lambda k, im: dino_global_crop(k, im, global_size, 1.0, 0.0)
    )(jax.random.split(kg1, b), images)
    g2 = jax.vmap(
        lambda k, im: dino_global_crop(k, im, global_size, 0.1, 0.2)
    )(jax.random.split(kg2, b), images)
    locals_ = []
    for i, k in enumerate(jax.random.split(kl, n_local)):
        locals_.append(
            jax.vmap(lambda kk, im: dino_local_crop(kk, im, local_size))(
                jax.random.split(k, b), images
            )
        )
    return jnp.stack([g1, g2]), (
        jnp.stack(locals_) if locals_ else
        jnp.zeros((0, b, local_size, local_size, 3))
    )
