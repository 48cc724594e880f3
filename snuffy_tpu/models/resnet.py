"""ResNet-18 backbone with selectable normalization, TPU-native.

The reference's SimCLR embedder is torchvision resnet18 with
`norm_layer=nn.InstanceNorm2d` (affine-less, no running stats) and the fc
head replaced by identity (reference compute_feats.py:404-438). flax
implementation mirrors the torch module tree name-for-name so checkpoint
import is a mechanical transpose (see snuffy_tpu.embed.torch_import):

  conv1 / bn1 / layer{1..4}.{0,1}.{conv1,bn1,conv2,bn2,downsample.{0,1}}

Output: (B, 512) global-average-pooled features.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): per-sample, per-channel spatial
    normalization, no learned parameters, no running stats. Statistics
    always accumulate in f32 (the bf16 compute path feeds bf16 activations
    through; a bf16 spatial mean over 112×112 loses ~2 decimal digits)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = x.astype(jnp.float32)
        mu = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.epsilon)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: y = (x − mean)/√(var+ε)·γ + β with imported
    running stats held as parameters (the embedder is frozen at extraction
    time, reference compute_feats.py:431-433)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias


def make_norm(kind: str, features: int) -> nn.Module:
    if kind == "instance":
        return InstanceNorm()
    if kind == "batch":
        return FrozenBatchNorm(features)
    raise KeyError(f"norm layer {kind!r} not in ('instance', 'batch')")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"
    dtype: object = None  # conv compute dtype (bf16 MXU path); norms are f32

    def _norm(self, name: str) -> nn.Module:
        if self.norm == "batch":
            return FrozenBatchNorm(self.features, name=name)
        return InstanceNorm()

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(self._norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(1, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self._norm("bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = self._norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1×1 → 3×3 → 1×1, expansion 4), mirrored
    name-for-name for checkpoint import (the DINO ResNet-50 release is a
    torchvision resnet50 state dict — reference dino_adapter/hubconf.py:
    84-99)."""

    features: int          # bottleneck width; output is 4× this
    stride: int = 1
    norm: str = "batch"
    dtype: object = None

    def _norm(self, feats: int, name: str) -> nn.Module:
        if self.norm == "batch":
            return FrozenBatchNorm(feats, name=name)
        return InstanceNorm()

    @nn.compact
    def __call__(self, x):
        out_feats = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(self._norm(self.features, "bn1")(y))
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(self._norm(self.features, "bn2")(y))
        y = nn.Conv(out_feats, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = self._norm(out_feats, "bn3")(y)
        if x.shape[-1] != out_feats or self.stride != 1:
            residual = nn.Conv(out_feats, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = self._norm(out_feats, "downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision resnet50 with fc→Identity — the DINO ResNet-50 backbone
    (reference dino_adapter/hubconf.py:84-99). Frozen inference/extraction
    model: BatchNorm runs off imported running stats."""

    norm: str = "batch"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) → (B, 2048)
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=cdt, name="conv1")(x)
        y = (FrozenBatchNorm(64, name="bn1")(y) if self.norm == "batch"
             else InstanceNorm()(y))
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        plan = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        for li, (feats, blocks, stride) in enumerate(plan, start=1):
            for bi in range(blocks):
                y = Bottleneck(feats, stride if bi == 0 else 1, self.norm,
                               dtype=cdt, name=f"layer{li}_{bi}")(y)
        return jnp.mean(y.astype(jnp.float32), axis=(1, 2))


class ResNet18(nn.Module):
    norm: str = "instance"
    # 'bfloat16' runs the convs on the MXU bf16 path; per-layer norms
    # (instance/frozen-batch) keep f32 statistics, output is f32.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) → (B, 512)
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=cdt, name="conv1")(x)
        y = (FrozenBatchNorm(64, name="bn1")(y) if self.norm == "batch"
             else InstanceNorm()(y))
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for li, (feats, stride) in enumerate(plan, start=1):
            for bi in range(2):
                y = BasicBlock(feats, stride if bi == 0 else 1, self.norm,
                               dtype=cdt, name=f"layer{li}_{bi}")(y)
        return jnp.mean(y.astype(jnp.float32), axis=(1, 2))
