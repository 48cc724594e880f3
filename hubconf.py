"""Published-checkpoint registry — counterpart of the reference's torch.hub
entries (reference dino_adapter/hubconf.py:22-151).

This environment has no network egress, so entries resolve to local `.pth`
paths when present and otherwise report the official URL to fetch. Loaded
weights go through snuffy_tpu.embed.torch_import into the flax models.
"""

from __future__ import annotations

import os
from typing import Optional

DINO_CHECKPOINTS = {
    "dino_vits16": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "dino_vits8": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth",
    "dino_vitb16": "https://dl.fbaipublicfiles.com/dino/dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "dino_vitb8": "https://dl.fbaipublicfiles.com/dino/dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
    "dino_resnet50": "https://dl.fbaipublicfiles.com/dino/dino_resnet50_pretrain/dino_resnet50_pretrain.pth",
    "dino_xcit_small_12_p16": "https://dl.fbaipublicfiles.com/dino/dino_xcit_small_12_p16_pretrain/dino_xcit_small_12_p16_pretrain.pth",
    "dino_xcit_small_12_p8": "https://dl.fbaipublicfiles.com/dino/dino_xcit_small_12_p8_pretrain/dino_xcit_small_12_p8_pretrain.pth",
    "dino_xcit_medium_24_p16": "https://dl.fbaipublicfiles.com/dino/dino_xcit_medium_24_p16_pretrain/dino_xcit_medium_24_p16_pretrain.pth",
    "dino_xcit_medium_24_p8": "https://dl.fbaipublicfiles.com/dino/dino_xcit_medium_24_p8_pretrain/dino_xcit_medium_24_p8_pretrain.pth",
}

MAE_CHECKPOINTS = {
    "mae_vit_base_patch16": "https://dl.fbaipublicfiles.com/mae/pretrain/mae_pretrain_vit_base.pth",
    "mae_vit_large_patch16": "https://dl.fbaipublicfiles.com/mae/pretrain/mae_pretrain_vit_large.pth",
}

_ARCH = {
    "dino_vits16": ("vit_small", 16),
    "dino_vits8": ("vit_small", 8),
    "dino_vitb16": ("vit_base", 16),
    "dino_vitb8": ("vit_base", 8),
}


def load_dino_backbone(name: str, weights_dir: str = "weights",
                       use_adapter: bool = False):
    """Build the flax ViT for a published DINO checkpoint and import its
    weights from `<weights_dir>/<name>.pth` (downloaded out-of-band)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.vit import vit_base, vit_small

    arch, patch = _ARCH[name]
    factory = {"vit_small": vit_small, "vit_base": vit_base}[arch]
    model = factory(patch_size=patch, output="cls", use_adapter=use_adapter)
    path = os.path.join(weights_dir, f"{name}.pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; download it from {DINO_CHECKPOINTS[name]}"
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    sd = ti.load_torch_state_dict(path)
    merged = ti.merge_into(params, ti.import_vit(sd))
    return model, merged


def load_dino_resnet50(weights_dir: str = "weights",
                       compute_dtype: str = "float32"):
    """DINO ResNet-50 backbone, fc→Identity (reference
    dino_adapter/hubconf.py:84-99): flax ResNet50 with FrozenBatchNorm off
    the published running stats. Returns (model, params); features are the
    (B, 2048) global-average pool."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.resnet import ResNet50

    model = ResNet50(norm="batch", compute_dtype=compute_dtype)
    path = os.path.join(weights_dir, "dino_resnet50.pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; download it from "
            f"{DINO_CHECKPOINTS['dino_resnet50']}"
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    sd = ti.load_torch_state_dict(path)
    merged = ti.merge_into(params, ti.import_resnet50(sd))
    return model, merged


def load_dino_xcit(name: str, weights_dir: str = "weights",
                   compute_dtype: str = "float32"):
    """DINO XCiT backbones (reference dino_adapter/hubconf.py:101-151; the
    reference pulls the architecture from the external facebookresearch/
    xcit hub repo — here it is a native flax implementation,
    snuffy_tpu/models/xcit.py)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.xcit import XCIT_FACTORIES

    model = XCIT_FACTORIES[name](compute_dtype=compute_dtype)
    path = os.path.join(weights_dir, f"{name}.pth")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found; download it from {DINO_CHECKPOINTS[name]}"
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    sd = ti.load_torch_state_dict(path)
    merged = ti.merge_into(params, ti.import_xcit(sd))
    return model, merged
