"""Masked-Autoencoder ViT with parallel adapters, TPU-native.

Rebuild of the reference MAE-adapter model (reference
mae_adapter/models_mae.py:21-271):
  * encoder/decoder are stacks of adapter-equipped pre-norm Blocks
    (models_mae.py:48-56, 69-77); the decoder adapter bottleneck is scaled
    by the dim ratio (models_mae.py:44-45);
  * positional embeddings are fixed 2-D sin-cos grids (models_mae.py:87-96);
  * random masking keeps a uniform subset per sample via argsort of uniform
    noise (models_mae.py:144-169) — here drawn from a jax PRNG stream, same
    distribution, jit-static shapes;
  * the loss is mean squared error over masked patches, with optional
    per-patch pixel normalization (models_mae.py:219-235);
  * `embed()` is the inference contract used by feature extraction: encoder
    with masking disabled, mean over patch tokens, then norm (reference
    utils_ssls_cf/models_mae_normal.py:155-176).

All shapes static: len_keep = int(N·(1−mask_ratio)) is a Python constant at
trace time for a fixed mask_ratio.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from snuffy_tpu.models.pos_embed import sincos_2d
from snuffy_tpu.models.vit import Block, PatchEmbed


class MaskedAutoencoderViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    use_adapter: bool = True
    adapter_bottleneck: int = 64
    adapter_scale: float = 0.1
    adapter_learnable_scale: bool = False
    adapter_layernorm_option: str = "none"
    # 'bfloat16' runs encoder/decoder block matmuls in bf16 (params f32;
    # the loss and emitted embeddings stay f32) — the TPU fast path for
    # feature extraction and pretraining.
    compute_dtype: str = "float32"
    # Packed-encoder attention mode ('masked' | 'blocked'), see
    # models/vit.py VisionTransformer.pack_mode — exact-math equal; masked
    # measured faster at pack=2, blocked at pack >= 4.
    pack_mode: str = "masked"

    @property
    def _cdt(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim,
                                      name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim),
        )
        self.blocks = [
            Block(
                self.embed_dim, self.num_heads, self.mlp_ratio, True,
                use_adapter=self.use_adapter,
                adapter_bottleneck=self.adapter_bottleneck,
                adapter_scale=self.adapter_scale,
                adapter_learnable_scale=self.adapter_learnable_scale,
                adapter_layernorm_option=self.adapter_layernorm_option,
                dtype=self._cdt,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        # enc_norm stays f32 even on the bf16 stream: it runs once per
        # forward on a small tensor, and `embed_tokens` feeds it the pooled
        # (B, D) embedding whose 'embeddings leave the model in f32'
        # contract would otherwise be silently bf16-rounded here.
        self.enc_norm = nn.LayerNorm(name="norm")

        self.decoder_embed = nn.Dense(self.decoder_embed_dim,
                                      name="decoder_embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.decoder_embed_dim),
        )
        dec_bottleneck = max(
            1,
            int(self.adapter_bottleneck * self.decoder_embed_dim / self.embed_dim),
        )
        self.decoder_blocks = [
            Block(
                self.decoder_embed_dim, self.decoder_num_heads, self.mlp_ratio,
                True, use_adapter=self.use_adapter,
                adapter_bottleneck=dec_bottleneck,
                adapter_scale=self.adapter_scale,
                adapter_learnable_scale=self.adapter_learnable_scale,
                adapter_layernorm_option=self.adapter_layernorm_option,
                dtype=self._cdt,
                name=f"decoder_blocks_{i}",
            )
            for i in range(self.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(name="decoder_norm")
        self.decoder_pred = nn.Dense(self.patch_size**2 * 3,
                                     name="decoder_pred")

    # ------------------------------------------------------------ patches

    def patchify(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) → (B, N, p²·3)."""
        p, g = self.patch_size, self.grid
        x = imgs.reshape(imgs.shape[0], g, p, g, p, 3)
        return jnp.einsum("bhpwqc->bhwpqc", x).reshape(
            imgs.shape[0], g * g, p * p * 3
        )

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p, g = self.patch_size, self.grid
        x = x.reshape(x.shape[0], g, g, p, p, 3)
        return jnp.einsum("bhwpqc->bhpwqc", x).reshape(
            x.shape[0], g * p, g * p, 3
        )

    # ------------------------------------------------------------- masking

    def random_masking(self, x: jnp.ndarray, mask_ratio: float, rng) -> Tuple:
        """Per-sample uniform subset: argsort of uniform noise
        (reference models_mae.py:144-169). Returns (x_keep, mask,
        ids_restore); mask is 1 where REMOVED."""
        b, n, d = x.shape
        len_keep = int(n * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (b, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_keep = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((b, n))
        mask = mask.at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_keep, mask, ids_restore

    # ------------------------------------------------------------- forward

    def _encode_tokens(self, imgs, deterministic):
        """Patchify + pos-embed + cls; no masking (inference path)."""
        x = self.patch_embed(imgs)
        pe = jnp.asarray(sincos_2d(self.embed_dim, self.grid))
        x = x + pe[:, 1:, :]
        cls = jnp.broadcast_to(
            self.cls_token + pe[:, :1, :], (x.shape[0], 1, self.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x, deterministic)
        return x

    def __call__(
        self,
        imgs: jnp.ndarray,
        mask_ratio: float = 0.75,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
        pack: int = 1,
    ):
        """Full MAE forward → (loss, pred (B,N,p²·3), mask (B,N)).

        `pack` > 1 folds groups of `pack` masked images into ONE encoder
        sequence (each keeps its own CLS; LayerNorm/MLP/adapter are
        per-token) — same math, but the memory-bound n≈50 encoder GEMMs
        run at n≈50·pack (ROOFLINE.md §5; VERDICT r3 item 3). Attention
        itself is block-batched inside MHSA (segments folded into the
        batch dim — zero extra attention FLOPs at any pack, VERDICT r4
        item 2). The decoder is untouched: its n=197 full sequence is
        already at that shape's ceiling."""
        x = self.patch_embed(imgs)
        pe = jnp.asarray(sincos_2d(self.embed_dim, self.grid))
        x = x + pe[:, 1:, :]
        if rng is None:
            rng = self.make_rng("masking")
        x, mask, ids_restore = self.random_masking(x, mask_ratio, rng)
        cls = jnp.broadcast_to(
            self.cls_token + pe[:, :1, :], (x.shape[0], 1, self.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        b, n_vis, _ = x.shape
        attn_mask = None
        if pack > 1:
            if b % pack:
                raise ValueError(f"batch {b} not divisible by pack={pack}")
            x = x.reshape(b // pack, pack * n_vis, self.embed_dim)
            if self.pack_mode == "masked":
                seg = jnp.repeat(jnp.arange(pack), n_vis)
                attn_mask = jnp.where(seg[:, None] == seg[None, :],
                                      0.0, -1e9)
        for blk in self.blocks:
            x = blk(x, deterministic, attn_mask=attn_mask, segments=pack)
        latent = self.enc_norm(x)
        if pack > 1:
            latent = latent.reshape(b, n_vis, self.embed_dim)

        # --- decoder
        y = self.decoder_embed(latent)
        b = y.shape[0]
        n_masked = self.num_patches + 1 - y.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token, (b, n_masked, self.decoder_embed_dim)
        )
        y_ = jnp.concatenate([y[:, 1:, :], mask_tokens], axis=1)
        y_ = jnp.take_along_axis(y_, ids_restore[:, :, None], axis=1)
        y = jnp.concatenate([y[:, :1, :], y_], axis=1)
        dpe = jnp.asarray(sincos_2d(self.decoder_embed_dim, self.grid))
        y = y + dpe
        for blk in self.decoder_blocks:
            y = blk(y, deterministic)
        y = self.decoder_norm(y)
        pred = self.decoder_pred(y)[:, 1:, :]

        # --- loss (reference models_mae.py:219-235)
        target = self.patchify(imgs)
        if self.norm_pix_loss:
            mu = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean((pred - target) ** 2, axis=-1)
        loss = jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss, pred, mask

    def embed_tokens(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """Inference contract for feature extraction: masking off, mean pool
        of patch tokens, then norm (reference
        utils_ssls_cf/models_mae_normal.py:155-176)."""
        x = self._encode_tokens(imgs, True)
        # mean-pool accumulates f32; embeddings leave the model in f32
        pooled = jnp.mean(x[:, 1:, :].astype(jnp.float32), axis=1)
        return self.enc_norm(pooled).astype(jnp.float32)


def embed(model: MaskedAutoencoderViT, variables, imgs: jnp.ndarray) -> jnp.ndarray:
    return model.apply(variables, imgs, method=MaskedAutoencoderViT.embed_tokens)


def mae_vit_base_patch16(**kw):
    return MaskedAutoencoderViT(
        patch_size=16, embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16, **kw
    )


def mae_vit_large_patch16(**kw):
    return MaskedAutoencoderViT(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16, **kw
    )


def mae_vit_huge_patch14(**kw):
    return MaskedAutoencoderViT(
        patch_size=14, embed_dim=1280, depth=32, num_heads=16,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16, **kw
    )
