"""Embedder registry: (embedder, backbone, use_adapter) → jittable forward.

Mirror of the reference registry (reference compute_feats.py:328-446):
  SimCLR → resnet18 with InstanceNorm, 512-d, global-average pool
  DINO   → ViT-S/B (patch 16 or 8), CLS output, optional parallel adapter
  MAE    → MAE ViT-B/L encoder, masking off, mean-pooled patch tokens

Every embedder is wrapped with a linear instance-classifier head — the
dsmil.IClassifier contract (reference dsmil.py:39-50, compute_feats.py:441)
— so `apply` returns (feats (B, D), logits (B, C)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.models.mae import (
    MaskedAutoencoderViT,
    mae_vit_base_patch16,
    mae_vit_large_patch16,
)
from snuffy_tpu.models.resnet import ResNet18
from snuffy_tpu.models.vit import vit_base, vit_small

EMBEDDER_FEAT_DIMS = {
    "resnet18": 512,
    "vit_small": 384,
    "vit_base": 768,
    "mae_vit_base_patch16": 768,
    "mae_vit_large_patch16": 1024,
}


@dataclass
class Embedder:
    """Backbone + linear head, with jitted batch apply."""

    backbone_apply: Callable  # (params, images) -> feats (B, D)
    num_feats: int
    num_classes: int
    params: Optional[dict] = None       # backbone params
    head_params: Optional[dict] = None  # {'kernel','bias'}

    def init_head(self, seed: int = 0):
        k = jax.random.PRNGKey(seed)
        kernel = jax.nn.initializers.lecun_normal()(
            k, (self.num_feats, self.num_classes)
        )
        self.head_params = {
            "kernel": np.asarray(kernel),
            "bias": np.zeros((self.num_classes,), np.float32),
        }

    def apply(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = self.backbone_apply(self.params, images)
        logits = feats @ self.head_params["kernel"] + self.head_params["bias"]
        return feats, logits

    def jit_apply(self, imagenet_norm: bool = False):
        """Jitted (params, head, images) → (feats, logits).

        Accepts uint8 images and normalizes ON DEVICE — host→device
        payloads stay 4× smaller than float32 (the transfer is the
        bottleneck on thin host links).
        """
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

        def fn(p, hp, im):
            if im.dtype == jnp.uint8:
                im = im.astype(jnp.float32) / 255.0
            if imagenet_norm:
                im = (im - mean) / std
            feats = self.backbone_apply(p, im)
            return feats, feats @ hp["kernel"] + hp["bias"]

        return jax.jit(fn)


def build_embedder(
    embedder: str = "SimCLR",
    backbone: str = "resnet18",
    num_classes: int = 2,
    patch_size: int = 16,
    use_adapter: bool = False,
    adapter_ffn_num: int = 64,
    adapter_ffn_scalar: float = 4.0,
    norm_layer: str = "instance",
    img_size: int = 224,
    seed: int = 0,
    compute_dtype: str = "float32",
) -> Embedder:
    """Build the embedder model and init params (to be overlaid by a
    checkpoint import). compute_dtype='bfloat16' runs the ViT matmuls in
    bf16 on the MXU (params and emitted embeddings stay float32) — the
    TPU-native fast path for feature extraction."""
    adapter_kw = dict(
        use_adapter=use_adapter,
        adapter_bottleneck=adapter_ffn_num,
        adapter_scale=adapter_ffn_scalar,
    )
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)

    if embedder.lower() == "simclr" or backbone == "resnet18":
        model = ResNet18(norm=norm_layer, compute_dtype=compute_dtype)
        params = model.init(key, dummy)["params"]
        apply = lambda p, im: model.apply({"params": p}, im)
        dim = 512
    elif embedder.upper() == "DINO":
        factory = {"vit_small": vit_small, "vit_base": vit_base}[backbone]
        model = factory(patch_size=patch_size, output="cls",
                        compute_dtype=compute_dtype, **adapter_kw)
        params = model.init(key, dummy)["params"]
        apply = lambda p, im: model.apply({"params": p}, im, True)
        dim = model.embed_dim
    elif embedder.upper() == "MAE":
        factory = {
            "mae_vit_base_patch16": mae_vit_base_patch16,
            "mae_vit_large_patch16": mae_vit_large_patch16,
        }[backbone]
        model = factory(img_size=img_size, compute_dtype=compute_dtype,
                        **adapter_kw)
        params = model.init(
            {"params": key, "masking": key}, dummy, 0.75, True
        )["params"]
        apply = lambda p, im: model.apply(
            {"params": p}, im, method=MaskedAutoencoderViT.embed_tokens
        )
        dim = model.embed_dim
    else:
        raise KeyError(f"Unknown embedder {embedder!r}/{backbone!r}")

    emb = Embedder(apply, dim, num_classes, params=params)
    emb.init_head(seed)
    return emb
