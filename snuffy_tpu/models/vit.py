"""TPU-native ViT family with parallel bottleneck adapters (PEFT).

Covers the reference's embedder model zoo (SURVEY.md §2.7/§2.9):
  - plain DINO ViT (CLS-token output, reference
    utils_ssls_cf/vision_transformer_dino.py:212-217)
  - DINO ViT with parallel adapter (reference
    dino_adapter/vision_transformer_with_adapter.py:97-127: the adapter
    branch reads the post-attention sequence and is added alongside the MLP
    residual: x = x + mlp(norm2(x)) + adapter(x))
  - `DINOHead` (3-layer MLP → L2-norm → weight-normed linear, reference
    dino_adapter/vision_transformer_with_adapter.py:279-314)

One implementation, flax.linen, batch-first (B, N, D); attention is a plain
dense softmax — XLA fuses it onto the MXU; sequence lengths are static
(fixed crop sizes), so every train/eval shape compiles once.

Adapter semantics (reference dino_adapter/adapter.py:35-95): optional
pre/post LayerNorm, down(d→bottleneck) → ReLU → dropout → up(→d) → ×scale,
LoRA-style init: down kaiming-normal(a=√5) ⇒ N(0, 1/(3·fan_in)); up zeros.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def lora_down_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(a=√5) on a (out,in) weight ⇒ std=1/√(3·fan_in).
    flax Dense kernels are (in, out) → fan_in = shape[0]."""
    std = 1.0 / math.sqrt(3.0 * shape[0])
    return jax.random.normal(key, shape, dtype) * std


class Adapter(nn.Module):
    d_model: int
    bottleneck: int = 64
    dropout: float = 0.1
    scale: float = 0.1               # ignored if learnable_scale
    learnable_scale: bool = False
    layernorm_option: str = "none"   # 'in' | 'out' | 'none'
    dtype: object = None             # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = x
        ln = None
        if self.layernorm_option in ("in", "out"):
            ln = nn.LayerNorm(dtype=self.dtype, name="ln")
        if self.layernorm_option == "in":
            h = ln(h)
        h = nn.Dense(self.bottleneck, kernel_init=lora_down_init,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="down")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="up")(h)
        if self.learnable_scale:
            s = self.param("scale", nn.initializers.ones, (1,))
            h = h * s
        else:
            h = h * self.scale
        if self.layernorm_option == "out":
            h = ln(h)
        return h


class MHSA(nn.Module):
    """Dense multi-head self-attention (timm-style fused QKV)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, attn_mask=None,
                 segments: int = 1):
        b, n, c = x.shape
        h = self.num_heads
        dk = c // h
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # Heads fold into the leading batch dim before the attention GEMMs:
        # (b·h, n, dk) batched matmuls measured ~1.6× faster than the 4D
        # einsum layout on v5e at ViT shapes (tools/profile_vit_attention2.py)
        # — XLA fuses these transposes into the GEMMs; the 4D form left a
        # standalone copy in the graph.
        qkv = qkv.reshape(b, n, 3, h, dk)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(b * h, n, dk)
        n_attn = n
        if segments > 1 and attn_mask is None:
            # Block-batched packed attention (VERDICT r4 item 2): the
            # packed sequence holds `segments` independent crops in
            # contiguous runs of n/segments tokens, so the blocks of the
            # block-diagonal attention fold into the batch dim — identical
            # math to the additive −1e9 mask (whose off-block softmax
            # weights underflow to exact zeros) at 1/segments the
            # attention FLOPs and 1/segments² the score memory. Only the
            # attention GEMMs see the split; qkv/proj/MLP/LN stay packed.
            n_attn = n // segments
            q = q.reshape(b * h * segments, n_attn, dk)
            k = k.reshape(b * h * segments, n_attn, dk)
            v = v.reshape(b * h * segments, n_attn, dk)
        # bf16 scores halve the (z, n, n) HBM round-trip; with the max-
        # subtracted softmax the result is bit-identical to the f32 path at
        # ViT scale (tools/profile_vit_attention3.py). f32 kept when the
        # model runs in f32 (torch-parity mode).
        score_t = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
        attn = jnp.einsum("znd,zmd->znm", q, k,
                          preferred_element_type=score_t) * (dk ** -0.5)
        if attn_mask is not None:
            # Additive (n, n) mask: −1e9 underflows to EXACTLY zero weight
            # through the max-subtracted softmax, so masked pairs
            # contribute nothing to the output.
            attn = attn + attn_mask.astype(attn.dtype)[None]
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("znm,zmd->znd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, h, n, dk).transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        # Attention maps: (b, h, n, n) normally; with segments > 1 the
        # per-block factors (b, h, segments, m, m) — the full matrix is
        # block-diagonal and never materialized (packing is a train-time
        # perf mode; viz paths run unpacked).
        if n_attn != n:
            attn = attn.reshape(b, h, segments, n_attn, n_attn)
        else:
            attn = attn.reshape(b, h, n, n)
        return out, attn


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


def drop_path(x, rate, deterministic, rng, segments: int = 1):
    """Stochastic depth on the residual branch (per sample). With crop
    packing (`segments` > 1) each packed row holds `segments` independent
    crops, so the keep/drop draw is per SEGMENT — matching the unpacked
    per-crop semantics — not per row."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    if segments > 1:
        b, n, d = x.shape
        mask = jax.random.bernoulli(rng, keep, (b, segments, 1, 1))
        x = x.reshape(b, segments, n // segments, d)
        return jnp.where(mask, x / keep, 0.0).reshape(b, n, d)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-norm transformer block with optional parallel adapter
    (reference dino_adapter/vision_transformer_with_adapter.py:97-127)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    use_adapter: bool = False
    adapter_bottleneck: int = 64
    adapter_scale: float = 0.1
    adapter_learnable_scale: bool = False
    adapter_layernorm_option: str = "none"
    dtype: object = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attention: bool = False,
                 attn_mask=None, segments: int = 1):
        y, attn = MHSA(self.dim, self.num_heads, self.qkv_bias,
                       self.attn_drop, self.drop, dtype=self.dtype,
                       name="attn")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x), deterministic,
            attn_mask=attn_mask, segments=segments,
        )
        if return_attention:
            return attn
        dp_rng = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = x + drop_path(y, self.drop_path_rate, deterministic, dp_rng,
                          segments)
        adapt_x = 0.0
        if self.use_adapter:
            # Parallel branch fed by the post-attention sequence.
            adapt_x = Adapter(
                self.dim,
                self.adapter_bottleneck,
                dropout=0.1,
                scale=self.adapter_scale,
                learnable_scale=self.adapter_learnable_scale,
                layernorm_option=self.adapter_layernorm_option,
                dtype=self.dtype,
                name="adaptmlp",
            )(x, deterministic)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                dtype=self.dtype, name="mlp")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), deterministic)
        dp_rng2 = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        return (x + drop_path(y, self.drop_path_rate, deterministic, dp_rng2,
                              segments) + adapt_x)


class PatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) → (B, N, D)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


def interpolate_pos_encoding(pos_embed: jnp.ndarray, n_patches: int, w: int, h: int,
                             patch_size: int) -> jnp.ndarray:
    """Bicubic-resize the grid part of a (1, 1+N0, D) pos embed to the current
    patch grid (reference dino_adapter/vision_transformer_with_adapter.py:196-216)."""
    n0 = pos_embed.shape[1] - 1
    if n_patches == n0:
        return pos_embed
    cls_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
    dim = pos_embed.shape[-1]
    g0 = int(round(math.sqrt(n0)))
    gw, gh = w // patch_size, h // patch_size
    grid = grid_pe.reshape(1, g0, g0, dim)
    grid = jax.image.resize(grid, (1, gh, gw, dim), method="bicubic")
    return jnp.concatenate([cls_pe, grid.reshape(1, gh * gw, dim)], axis=1)


class VisionTransformer(nn.Module):
    """ViT backbone; output mode selects the embedder contract:
    'cls'  — CLS token (DINO, reference utils_ssls_cf/vision_transformer_dino.py:212)
    'mean' — mean of patch tokens then norm (MAE inference,
             reference utils_ssls_cf/models_mae_normal.py:155-176)
    'tokens' — full normed sequence (SSL heads / MAE encoder reuse).
    """

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_adapter: bool = False
    adapter_bottleneck: int = 64
    adapter_scale: float = 0.1
    adapter_learnable_scale: bool = False
    adapter_layernorm_option: str = "none"
    output: str = "cls"
    # 'bfloat16' runs every matmul/LayerNorm in bf16 on the MXU (params and
    # the pos-embed interpolation stay f32); 'float32' is the torch-parity
    # default.
    compute_dtype: str = "float32"
    # How packed (pack > 1) sequences run their attention — both are
    # exact-math equal (tests/test_ssl.py):
    # 'masked'  — one n=pack·m attention with a block-diagonal additive
    #             mask; pack² the FLOPs of unpacked, but the bigger GEMM
    #             is better shaped (measured fastest at pack=2:
    #             ~650 vs ~630 samples/s on the DINO B=16 step).
    # 'blocked' — segments fold into the attention batch dim; zero extra
    #             attention FLOPs, the right mode for pack ≥ 4 (recovers
    #             the r4 pack4/8 collapse: 531 → 606 samples/s).
    pack_mode: str = "masked"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, pack: int = 1):
        """`pack` > 1 folds groups of `pack` images into ONE transformer
        sequence (each image keeps its own CLS + pos embed; LayerNorm/MLP/
        adapter are per-token, and droppath draws per segment). Outputs are
        tolerance-equal to pack=1, but the qkv/proj/MLP GEMMs run at
        sequence length pack·n, lifting the memory-bound small-n DINO-crop
        regime (ROOFLINE.md §5; VERDICT r3 item 3). Attention itself is
        block-batched inside MHSA (segments fold into the batch dim), so
        packing adds ZERO attention FLOPs at any pack factor (VERDICT r4
        item 2). Requires B % pack == 0."""
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        b, h_img, w_img, _ = x.shape
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=cdt,
                       name="patch_embed")(x)
        n = x.shape[1]
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim),
        )
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, 1 + (224 // self.patch_size) ** 2, self.embed_dim),
        )
        pe = interpolate_pos_encoding(pos_embed, n, w_img, h_img, self.patch_size)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        ) + pe.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        attn_mask = None
        seq = x.shape[1]
        if pack > 1:
            if b % pack:
                raise ValueError(f"batch {b} not divisible by pack={pack}")
            x = x.reshape(b // pack, pack * seq, self.embed_dim)
            if self.pack_mode == "masked":
                seg = jnp.repeat(jnp.arange(pack), seq)
                attn_mask = jnp.where(seg[:, None] == seg[None, :],
                                      0.0, -1e9)
            # else 'blocked': MHSA folds the segments into its batch dim
            # (block-batched attention, VERDICT r4 item 2).

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = Block(
                self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.drop_rate, self.attn_drop_rate, float(dpr[i]),
                self.use_adapter, self.adapter_bottleneck, self.adapter_scale,
                self.adapter_learnable_scale, self.adapter_layernorm_option,
                dtype=cdt,
                name=f"blocks_{i}",
            )(x, deterministic, attn_mask=attn_mask, segments=pack)
        if pack > 1:
            x = x.reshape(b, seq, self.embed_dim)
        norm = nn.LayerNorm(dtype=cdt, name="norm")
        if self.output == "cls":
            # LayerNorm is per-token: norm(x)[:, 0] ≡ norm(x[:, :1])[:, 0],
            # so skip normalizing the 196 patch tokens nobody reads.
            out = norm(x[:, :1])[:, 0]
            return out.astype(jnp.float32) if cdt is not None else out
        x = norm(x)
        if cdt is not None:
            x = x.astype(jnp.float32)  # embeddings leave the model in f32
        if self.output == "mean":
            return jnp.mean(x[:, 1:], axis=1)
        return x


def vit_tiny(**kw):
    return VisionTransformer(embed_dim=192, depth=12, num_heads=3, **kw)


def vit_small(**kw):
    return VisionTransformer(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw):
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(**kw):
    return VisionTransformer(embed_dim=1024, depth=24, num_heads=16, **kw)


class DINOHead(nn.Module):
    """3-layer MLP (optional BatchNorm) → L2-norm → weight-normed linear
    (reference dino_adapter/vision_transformer_with_adapter.py:279-314).

    With `use_bn`, a BatchNorm follows each hidden Dense (torch layout
    Linear→BN→GELU, reference :289-294). `train=True` normalizes with batch
    statistics and updates the 'batch_stats' collection (call with
    mutable=['batch_stats']); `train=False` uses the running averages.
    flax momentum 0.9 ≡ torch BatchNorm1d momentum 0.1.
    """

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    use_bn: bool = False
    norm_last_layer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = nn.initializers.truncated_normal(0.02)
        for i, feats in enumerate((self.hidden_dim, self.hidden_dim,
                                   self.bottleneck_dim)):
            x = nn.Dense(feats, kernel_init=init, name=f"mlp_{i}")(x)
            if i < 2:
                if self.use_bn:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=f"bn_{i}",
                    )(x)
                x = nn.gelu(x, approximate=False)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        # weight-norm last layer: direction v (trainable), magnitude g
        # (fixed at 1 when norm_last_layer, trainable otherwise).
        v = self.param("last_layer_v", init, (self.bottleneck_dim, self.out_dim))
        if self.norm_last_layer:
            g = jnp.ones((self.out_dim,), x.dtype)
        else:
            g = self.param("last_layer_g", nn.initializers.ones, (self.out_dim,))
        w = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12) * g
        return x @ w
