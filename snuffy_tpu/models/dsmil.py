"""DSMIL dual-stream MIL baseline, TPU-native (reference dsmil.py:28-106).

Role in the pipeline: `FCLayer` is the precomputed-features instance
classifier; the embedder wrapper role of the reference's `IClassifier`
(reference compute_feats.py:441-446) is filled by
snuffy_tpu.embed.registry.Embedder; `BClassifier` is the dual-stream
attention baseline (critical-instance query + Conv1d bag head).

Mask-aware: padded rows are excluded from the critical-instance argmax and
from the attention softmax (the softmax is over the INSTANCE axis here —
column-normalized — unlike Snuffy's per-row softmax).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class FCLayer(nn.Module):
    """feats → (feats, logits) (reference dsmil.py:28-36)."""

    num_classes: int = 1

    @nn.compact
    def __call__(self, feats):
        return feats, nn.Dense(self.num_classes, name="fc")(feats)


class BClassifier(nn.Module):
    """Dual-stream bag classifier (reference dsmil.py:53-92).

    q: 2-layer MLP → tanh (128-d queries); v: identity or dropout+linear+relu
    when passing_v; attention = column-softmax over instances of Q·q_maxᵀ;
    bag head = per-class Conv1d over the bag representation, i.e. one inner
    product per class row.
    """

    input_size: int
    num_classes: int
    dropout_v: float = 0.0
    nonlinear: bool = True
    passing_v: bool = False
    q_dim: int = 128

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,        # (N, K)
        c: jnp.ndarray,            # (N, C) instance logits
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        n = feats.shape[0]
        if mask is None:
            mask = jnp.ones((n,), bool)

        q1 = nn.Dense(self.q_dim, name="q1")
        q2 = nn.Dense(self.q_dim, name="q2") if self.nonlinear else None

        def q_proj(x):
            if self.nonlinear:
                return jnp.tanh(q2(nn.relu(q1(x))))
            return q1(x)

        q = q_proj(feats)

        if self.passing_v:
            v = nn.Dropout(self.dropout_v, deterministic=deterministic)(feats)
            v = nn.Dense(self.input_size, name="v")(v)
            v = nn.relu(v)
        else:
            v = feats

        # critical instance per class: argmax of masked logits
        # (reference dsmil.py:78-81: descending sort, first row).
        guarded = jnp.where(mask[:, None], c, NEG_INF)
        crit_idx = jnp.argmax(guarded, axis=0)            # (C,)
        m_feats = feats[crit_idx]                          # (C, K)
        q_max = q_proj(m_feats)                            # shared weights

        scores = q @ q_max.T / jnp.sqrt(jnp.float32(self.q_dim))  # (N, C)
        scores = jnp.where(mask[:, None], scores, NEG_INF)
        a = jax.nn.softmax(scores, axis=0)                 # column softmax
        b = a.T @ v                                         # (C, V)

        # Conv1d(C→C, kernel=input_size) over the (1, C, V) bag matrix:
        # each output class mixes ALL class rows of B
        # (reference dsmil.py:70,88-90).
        w = self.param(
            "fcc_kernel", nn.initializers.lecun_normal(),
            (self.num_classes, self.num_classes, b.shape[1]),
        )
        bias = self.param("fcc_bias", nn.initializers.zeros,
                          (self.num_classes,))
        bag_logits = jnp.einsum("ocv,cv->o", w, b) + bias    # (C,)
        return bag_logits, a, b


class MILNet(nn.Module):
    """i_classifier + dual-stream b_classifier (reference dsmil.py:95-106)."""

    feats_size: int
    num_classes: int = 1
    dropout_v: float = 0.0
    nonlinear: bool = True
    passing_v: bool = False

    @nn.compact
    def __call__(self, feats, mask=None, deterministic: bool = True):
        feats, classes = FCLayer(self.num_classes, name="i_classifier")(feats)
        bag_logits, a, b = BClassifier(
            self.feats_size, self.num_classes, self.dropout_v,
            self.nonlinear, self.passing_v, name="b_classifier",
        )(feats, classes, mask, deterministic)
        return classes, bag_logits, a
