"""Snuffy sparse-transformer MIL model, TPU-native.

Covers both reference model files:
  - binary   (reference snuffy.py:34-238)
  - multiclass (reference snuffy_multiclass.py:34-253)
selected by `SnuffyModelConfig.multiclass`.

Design differences from the reference (deliberate, TPU-first):
  * One bag is a static-shape (N_pad, D) array plus a (N_pad,) validity
    mask; ragged bags are bucketed by the data layer. All selection,
    attention, scatter, pooling and losses are mask-correct, so results on
    the valid prefix equal the unpadded reference.
  * The per-layer random share is drawn on-device (Gumbel top-k) from a
    `'sparse'` RNG stream instead of host `np.random.choice`
    (snuffy.py:141) — no host↔device sync in the hot loop.
  * Attention runs through `inverted_sparse_attention` (XLA einsum) or the
    fused Pallas kernel; both produce (Λ, d) outputs scattered back into the
    sequence with `x.at[idx].set(..., mode='drop')`, the jit-safe equivalent
    of `y[:, selected_indices, :] = x_big_lambda` (snuffy.py:152-155).

Forward signature (single bag; vmap for batches):
    ins_logits (N, C), bag_logits (C,), p_attn (h, N, S) =
        MILNet(cfg).apply(params, feats, mask,
                          rngs={'sparse': k1, 'dropout': k2},
                          deterministic=...)

Faithfully kept quirks:
  * attention keys are projected from the *pre-norm* selected tokens while
    queries/values come from LayerNorm(x) (snuffy.py:107 + 131/145: the
    gather happens before `self.norm(x)` is applied inside
    SublayerConnection);
  * the attention residual is the pre-norm selected tokens
    (snuffy.py:102-108);
  * attention-probability dropout defaults to 0.1 (snuffy.py:171-181).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from snuffy_tpu.configs import SnuffyModelConfig
from snuffy_tpu.ops.init import get_weight_init
from snuffy_tpu.ops.selection import (
    PreparedSelection,
    Selection,
    binary_selection_draw,
    binary_selection_prepare,
    multiclass_selection_draw,
    multiclass_selection_prepare,
    packed_selection_draw,
    packed_selection_prepare,
)
from snuffy_tpu.ops.sparse_attention import inverted_sparse_attention

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "selu": jax.nn.selu,
}


def _dense(features: int, init_name: str, name: str, dtype=None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=get_weight_init(init_name),
        bias_init=jax.nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )


class _ProjParams(nn.Module):
    """Dense-layer parameters WITHOUT the matmul — lets two projections of
    the same operand share ONE d→2d GEMM at apply time while the param
    tree (and .pth interop) keeps the reference's separate wq/wv layout.
    Param names/shapes are identical to nn.Dense's."""

    features: int
    init_name: str

    @nn.compact
    def __call__(self, d_in: int):
        kernel = self.param("kernel", get_weight_init(self.init_name),
                            (d_in, self.features))
        bias = self.param("bias", jax.nn.initializers.zeros,
                          (self.features,))
        return kernel, bias


def compute_dtype_of(cfg: SnuffyModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def ln_dtype(cfg: SnuffyModelConfig):
    """LayerNorm compute dtype: bf16 on the bf16 stream, flax default
    (None -> promote to f32) otherwise."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


class FCLayer(nn.Module):
    """Instance classifier: feats → (feats, logits) (reference snuffy.py:34-41)."""

    num_classes: int
    init_name: str

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = _dense(self.num_classes, self.init_name, "fc")(feats)
        return feats, logits


def _sp_size(mesh: Optional[Mesh]) -> int:
    # Lazy import: snuffy_tpu.parallel's package init imports back into the
    # model/trainer stack.
    from snuffy_tpu.parallel.sp_attention import sp_size

    return sp_size(mesh)


class MultiHeadedAttention(nn.Module):
    """Q/K/V/O projections around the inverted sparse attention
    (reference snuffy.py:171-205). With a mesh whose `sp` axis is >1, the
    N-sharded q/v rows stay sharded through the sequence-parallel op."""

    cfg: SnuffyModelConfig
    mesh: Optional[Mesh] = None
    # >1: rows/slots carry `segments` bags packed on the row axis; each
    # bag's queries attend only to its own slots (ops/selection.py
    # "packed bags"). Single-device only (sp/tp shard the one-bag layout).
    segments: int = 1

    @nn.compact
    def __call__(
        self,
        query_src: jnp.ndarray,   # (N, d) — LayerNorm(x)
        key_tokens: jnp.ndarray,  # (S, d) — pre-norm selected tokens
        value_src: jnp.ndarray,   # (N, d) — LayerNorm(x)
        slot_valid: jnp.ndarray,  # (S,)
        q_valid: jnp.ndarray,     # (N,)
        deterministic: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        d, h = cfg.feats_size, cfg.num_heads
        assert d % h == 0, "feats_size must be divisible by num_heads"
        dk = d // h
        init = cfg.weight_init_b

        cdt = compute_dtype_of(cfg)

        def split_heads(t):  # (L, d) -> (h, L, dk)
            return t.reshape(t.shape[0], h, dk).transpose(1, 0, 2)

        # q and v project the SAME operand (the caller passes LayerNorm(x)
        # for both) — fuse them into one d→2d GEMM: at N=10240/d=384 a
        # 384→768 GEMM runs in a better MXU efficiency class than two
        # 384→384 GEMMs (ROOFLINE.md §1: 28.1 vs 76.9 TFLOP/s for the
        # wider shapes). Params stay the reference's separate wq/wv.
        qk_kernel, qk_bias = _ProjParams(d, init, name="wq")(d)
        vk_kernel, vk_bias = _ProjParams(d, init, name="wv")(d)
        if query_src is value_src:
            fused_kernel = jnp.concatenate(
                [qk_kernel, vk_kernel], axis=1).astype(cdt)
            fused_bias = jnp.concatenate([qk_bias, vk_bias]).astype(cdt)
            qv = query_src.astype(cdt) @ fused_kernel + fused_bias
            q = split_heads(qv[:, :d])
            v = split_heads(qv[:, d:])
        else:
            q = split_heads(query_src.astype(cdt) @ qk_kernel.astype(cdt)
                            + qk_bias.astype(cdt))
            v = split_heads(value_src.astype(cdt) @ vk_kernel.astype(cdt)
                            + vk_bias.astype(cdt))
        k = split_heads(_dense(d, init, "wk", cdt)(key_tokens))

        drop_rng = None
        rate = cfg.attention_dropout
        if rate > 0.0 and not deterministic:
            drop_rng = self.make_rng("dropout")

        if self.segments > 1:
            if _sp_size(self.mesh) > 1:
                raise NotImplementedError(
                    "packed bags (segments > 1) and sequence parallelism "
                    "shard the same row axis — use one or the other"
                )
            if cfg.use_pallas:
                from snuffy_tpu.ops.pallas_attention import (
                    fused_packed_inverted_sparse_attention,
                )
                from snuffy_tpu.parallel.tp_attention import tp_size

                if tp_size(self.mesh) > 1:
                    raise NotImplementedError(
                        "packed bags do not compose with tensor "
                        "parallelism yet"
                    )
                seed = None
                if drop_rng is not None:
                    seed = jax.random.randint(
                        drop_rng, (), 0, 2**31 - 1, dtype=jnp.int32
                    )
                out = fused_packed_inverted_sparse_attention(
                    q, k, v, slot_valid, q_valid, self.segments,
                    dropout_rate=rate if seed is not None else 0.0,
                    dropout_seed=seed, tile_n=cfg.pallas_tile_n,
                )
            else:
                from snuffy_tpu.ops.sparse_attention import (
                    packed_inverted_sparse_attention,
                )

                out = packed_inverted_sparse_attention(
                    q, k, v, slot_valid, q_valid, self.segments,
                    dropout_rate=0.0 if deterministic else rate,
                    dropout_rng=drop_rng,
                )
            p_attn = None
        elif _sp_size(self.mesh) > 1:
            from snuffy_tpu.parallel.sp_attention import (
                sp_inverted_sparse_attention,
            )

            out = sp_inverted_sparse_attention(
                q, k, v, slot_valid, q_valid, self.mesh,
                use_pallas=cfg.use_pallas, tile_n=cfg.pallas_tile_n,
                dropout_rate=rate if drop_rng is not None else 0.0,
                dropout_rng=drop_rng,
            )
            p_attn = None
        elif cfg.use_pallas:
            # Fused flash-style kernel: no (h, N, S) probability tensor in
            # HBM. Attention-prob dropout (the reference's bernoulli-on-p,
            # snuffy.py:167/181) runs inside the kernel from a counter-based
            # hash seeded by the 'dropout' stream.
            from snuffy_tpu.ops.pallas_attention import (
                fused_inverted_sparse_attention,
            )
            from snuffy_tpu.parallel.tp_attention import (
                tp_fused_inverted_sparse_attention,
                tp_size,
            )

            seed = None
            if drop_rng is not None:
                seed = jax.random.randint(
                    drop_rng, (), 0, 2**31 - 1, dtype=jnp.int32
                )
            if tp_size(self.mesh) > 1:
                # Megatron tp: heads are already tp-sharded by the
                # column-parallel projections; the head-sharded shard_map
                # wrapper keeps the fused kernel under tp (pallas_call has
                # no GSPMD rule — left auto it would replicate;
                # VERDICT r4 item 5).
                out = tp_fused_inverted_sparse_attention(
                    q, k, v, slot_valid, q_valid, self.mesh,
                    dropout_rate=rate if seed is not None else 0.0,
                    dropout_seed=seed, tile_n=cfg.pallas_tile_n,
                )
            elif seed is not None:
                out = fused_inverted_sparse_attention(
                    q, k, v, slot_valid, q_valid,
                    dropout_rate=rate, dropout_seed=seed,
                    tile_n=cfg.pallas_tile_n,
                )
            else:
                out = fused_inverted_sparse_attention(
                    q, k, v, slot_valid, q_valid, tile_n=cfg.pallas_tile_n
                )
            p_attn = None
        else:
            out, p_attn = inverted_sparse_attention(
                q, k, v, slot_valid, q_valid,
                dropout_rate=0.0 if deterministic else rate,
                dropout_rng=drop_rng,
            )
        # (h, S, dk) -> (S, d)
        out = out.transpose(1, 0, 2).reshape(out.shape[1], d)
        return _dense(d, init, "wo", cdt)(out), p_attn


class PositionwiseFeedForward(nn.Module):
    """d → d·mult → activation → dropout → d (reference snuffy.py:208-225)."""

    cfg: SnuffyModelConfig
    dropout_rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        cdt = compute_dtype_of(cfg)
        act = ACTIVATIONS[cfg.activation]
        h = _dense(cfg.feats_size * cfg.mlp_multiplier, cfg.weight_init_b,
                   "w1", cdt)(x)
        h = act(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return _dense(cfg.feats_size, cfg.weight_init_b, "w2", cdt)(h)


class EncoderLayer(nn.Module):
    """One sparse-attention block: select Λ tokens, attend, scatter, FFN
    (reference snuffy.py:113-157 / snuffy_multiclass.py:116-171)."""

    cfg: SnuffyModelConfig
    ffn_dropout: float
    mesh: Optional[Mesh] = None
    segments: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (N, d) — or (k·N, d) packed
        prep: PreparedSelection,   # hoisted top share (c is layer-invariant)
        mask: jnp.ndarray,         # (N,) bool
        deterministic: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        n = x.shape[0]
        sparse_key = self.make_rng("sparse")

        # Only the uniform random share is re-drawn per layer; the top share
        # is computed once per forward (reference snuffy.py:128 re-sorts the
        # same `c` every layer — identical result, redundant work).
        if self.segments > 1:
            # prep is batched per segment; the draw returns packed row
            # coordinates, so gather/scatter below work unchanged.
            sel = packed_selection_draw(
                sparse_key, prep, cfg.k_rand, n // self.segments,
                multiclass=cfg.multiclass,
            )
        elif cfg.multiclass:
            sel = multiclass_selection_draw(sparse_key, prep)
        else:
            sel = binary_selection_draw(sparse_key, prep, cfg.k_rand)
        # Expose the realized selection for tests/visualization via
        # apply(..., mutable=['intermediates']).
        self.sow("intermediates", "sel_indices", sel.indices)
        self.sow("intermediates", "sel_valid", sel.slot_valid)

        # Gather from PRE-norm x: both the key tokens and the residual branch
        # (reference snuffy.py:131,145 + SublayerConnection snuffy.py:102-108).
        # Under sequence parallelism the gather runs as a shard_map so the
        # (N, d) stream is never materialized on one device.
        sp = _sp_size(self.mesh)
        if sp > 1:
            from snuffy_tpu.parallel.sp_attention import sp_gather_rows

            sel_tokens = sp_gather_rows(x, sel.indices, self.mesh)
        else:
            # jnp.take + at[].set are fine under vmap IN THE FULL PROGRAM:
            # the flat-under-vmap row ops (ops/experimental/batched_rows.py) A/B'd to
            # zero change here — the batched-mode gap is vmap-vs-scan
            # backward fusion, not the scatters
            # (tools/profile_batched_step.py).
            sel_tokens = jnp.take(x, sel.indices, axis=0)

        normed = nn.LayerNorm(dtype=ln_dtype(cfg), name="ln_attn")(x)
        attn_out, p_attn = MultiHeadedAttention(
            cfg, self.mesh, self.segments, name="attn"
        )(normed, sel_tokens, normed, sel.slot_valid, mask, deterministic)
        attn_out = nn.Dropout(cfg.encoder_dropout, deterministic=deterministic)(
            attn_out
        )
        new_sel = sel_tokens + attn_out

        # Scatter updated rows back; invalid slots are routed out of bounds
        # and dropped (equiv. of snuffy.py:152-155 on the valid sub-bag).
        if sp > 1:
            from snuffy_tpu.parallel.sp_attention import sp_scatter_rows

            y = sp_scatter_rows(
                x, sel.indices, sel.slot_valid, new_sel, self.mesh
            )
        else:
            scatter_idx = jnp.where(sel.slot_valid, sel.indices, jnp.int32(n))
            y = x.at[scatter_idx].set(new_sel, mode="drop")

        ff = PositionwiseFeedForward(cfg, self.ffn_dropout, name="ff")(
            nn.LayerNorm(dtype=ln_dtype(cfg), name="ln_ff")(y), deterministic
        )
        ff = nn.Dropout(cfg.encoder_dropout, deterministic=deterministic)(ff)
        return y + ff, p_attn


class Encoder(nn.Module):
    """Stack of depth EncoderLayers + final LayerNorm (reference snuffy.py:74-86)."""

    cfg: SnuffyModelConfig
    ffn_dropout: float
    mesh: Optional[Mesh] = None
    segments: int = 1

    @nn.compact
    def __call__(self, x, c, mask, deterministic):
        cfg = self.cfg
        if self.segments > 1:
            k, n_seg = self.segments, x.shape[0] // self.segments
            prep = packed_selection_prepare(
                c.reshape(k, n_seg, -1) if cfg.multiclass
                else c[:, 0].reshape(k, n_seg),
                mask.reshape(k, n_seg),
                cfg.k_top if cfg.multiclass else min(cfg.k_top, n_seg),
                multiclass=cfg.multiclass,
            )
        elif cfg.multiclass:
            prep = multiclass_selection_prepare(c, mask, cfg.k_top)
        else:
            prep = binary_selection_prepare(
                c[:, 0], mask, min(cfg.k_top, x.shape[0])
            )
        p_attn = None
        layer_cls = EncoderLayer
        if cfg.remat:
            # Rematerialize each layer's activations in the backward pass:
            # the HBM-for-FLOPs trade (jax.checkpoint) that lets ultra-long
            # bags (N >> 10k) train on one chip without spilling the per-
            # layer (N, d) residual stream. `deterministic` is static
            # (argnum 4 incl. self); RNGs/params are handled by flax.
            layer_cls = nn.remat(EncoderLayer, static_argnums=(4,))
        for i in range(cfg.depth):
            x, p_attn = layer_cls(
                cfg, self.ffn_dropout, self.mesh, self.segments,
                name=f"layer_{i}",
            )(x, prep, mask, deterministic)
        return nn.LayerNorm(dtype=ln_dtype(cfg), name="ln_final")(x), p_attn


class BClassifier(nn.Module):
    """Encoder → masked mean pool → linear bag head (reference snuffy.py:62-71)."""

    cfg: SnuffyModelConfig
    ffn_dropout: float
    mesh: Optional[Mesh] = None
    segments: int = 1

    @nn.compact
    def __call__(self, x, c, mask, deterministic):
        enc, p_attn = Encoder(
            self.cfg, self.ffn_dropout, self.mesh, self.segments,
            name="encoder",
        )(x, c, mask, deterministic)
        # masked mean accumulates in f32 regardless of the stream dtype
        if self.segments > 1:
            k, n_seg = self.segments, enc.shape[0] // self.segments
            enc_b = enc.reshape(k, n_seg, -1)
            mask_b = mask.reshape(k, n_seg)
            denom = jnp.maximum(mask_b.sum(axis=1), 1).astype(jnp.float32)
            pooled = jnp.sum(
                enc_b * mask_b[:, :, None].astype(enc.dtype), axis=1,
                dtype=jnp.float32,
            ) / denom[:, None]                       # (k, d)
        else:
            denom = jnp.maximum(jnp.sum(mask), 1).astype(jnp.float32)
            pooled = jnp.sum(enc * mask[:, None].astype(enc.dtype), axis=0,
                             dtype=jnp.float32) / denom
        bag_logits = _dense(self.cfg.num_classes, self.cfg.weight_init_b, "linear")(
            pooled
        )
        return bag_logits, p_attn


class MILNet(nn.Module):
    """i_classifier + b_classifier (reference snuffy.py:228-238).

    __call__(feats (N, d), mask (N,)) →
        (ins_logits (N, C), bag_logits (C,), p_attn (h, N, S))
    """

    cfg: SnuffyModelConfig
    ffn_dropout: Optional[float] = None
    # Device mesh with an `sp` axis: shards the N (token) axis of the
    # residual stream across devices (see parallel/sp_attention.py). None →
    # the single-device path, bit-identical to before.
    mesh: Optional[Mesh] = None
    # >1: feats/mask carry `segments` equal-length bags packed on the row
    # axis; bag_logits come back (segments, C). Same parameter tree as
    # segments=1 — packing is an execution layout, not an architecture
    # change (the batched-bags fast path: GEMMs run at M=k·N, see
    # ops/selection.py "packed bags").
    segments: int = 1

    def _ffn_dropout(self) -> float:
        if self.ffn_dropout is not None:
            return self.ffn_dropout
        # Reference FFN-internal dropout: binary uses encoder_dropout
        # (train.py:870-875), multiclass leaves the 0.1 default
        # (train.py:932-936 + snuffy_multiclass.py:226).
        return 0.1 if self.cfg.multiclass else self.cfg.encoder_dropout

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        if mask is None:
            mask = jnp.ones(feats.shape[0], dtype=bool)
        feats = feats * mask[:, None].astype(feats.dtype)
        _, ins_logits = FCLayer(
            self.cfg.num_classes, self.cfg.weight_init_i, name="i_classifier"
        )(feats)
        if self.cfg.compute_dtype == "bfloat16":
            # bf16 residual stream through the encoder: halves LayerNorm/
            # scatter/residual HBM traffic. Instance logits (selection +
            # instance metrics) are computed above from f32 feats; pooling
            # accumulates f32 and the bag head promotes back to f32.
            feats = feats.astype(jnp.bfloat16)
        bag_logits, p_attn = BClassifier(
            self.cfg, self._ffn_dropout(), self.mesh, self.segments,
            name="b_classifier",
        )(feats, ins_logits, mask, deterministic)
        return ins_logits, bag_logits, p_attn


def build_milnet(
    cfg: SnuffyModelConfig, mesh: Optional[Mesh] = None, segments: int = 1
) -> MILNet:
    return MILNet(cfg, mesh=mesh, segments=segments)


def init_milnet_params(cfg: SnuffyModelConfig, seed: int = 0, n_example: int = 64):
    """Initialize parameters with a dummy bag of length n_example."""
    model = build_milnet(cfg)
    k_param, k_sparse = jax.random.split(jax.random.PRNGKey(seed))
    feats = jnp.zeros((n_example, cfg.feats_size), jnp.float32)
    mask = jnp.ones((n_example,), bool)
    variables = model.init(
        {"params": k_param, "sparse": k_sparse}, feats, mask, True
    )
    return variables["params"]
