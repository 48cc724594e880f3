"""MIL losses: weighted BCE-with-logits and the learnable bag/instance mix.

Semantics follow the reference trainer (reference train.py:158-164 criterion,
train.py:828-846 loss mixing, utils.py:499-507 pos_weight): the total loss is

    w · BCE(bag_logits, y) + (1 − w) · BCE(max_i ins_logits, y)

with w = `single_weight_parameter` ∈ [0, 1] (fixed 0.5 unless
`soft_average`, reference train.py:802-807), and the reported bag score is
the matching sigmoid mixture (train.py:840-844). For the classic MIL
datasets the BCE is positive-class weighted by (n−p)/p computed from the
train split (train.py:246-249).

Everything here is pure jnp and mask-aware: padded instance rows are
excluded from the max-instance reduction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean BCE-with-logits, numerically stable, matching
    torch.nn.BCEWithLogitsLoss(pos_weight) semantics:

        l = -[ pw·y·log σ(x) + (1−y)·log(1−σ(x)) ]
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = 1.0 if pos_weight is None else pos_weight
    losses = -(pw * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(losses)


def masked_instance_max(ins_logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """max over valid instances, per class: (N, C), (N,) → (C,).

    Equivalent of `torch.max(ins_prediction, 0)` (reference train.py:830-833)
    on the unpadded bag. The guard is a large finite negative, not −inf: an
    all-padded dummy bag (batched-mode tail padding) would otherwise emit
    −inf max-logits and a 0·(−inf)=NaN BCE term that poisons the batch mean.
    """
    guarded = jnp.where(mask[:, None], ins_logits, jnp.float32(-1e30))
    return jnp.max(guarded, axis=0)


def mixed_mil_loss(
    ins_logits: jnp.ndarray,   # (N, C)
    bag_logits: jnp.ndarray,   # (C,)
    bag_label: jnp.ndarray,    # (C,)
    mask: jnp.ndarray,         # (N,)
    w: jnp.ndarray,            # scalar in [0, 1]
    pos_weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loss, bag_score (C,)) — the reference's `_run_model` math
    (train.py:828-846)."""
    max_logits = masked_instance_max(ins_logits, mask)
    bag_loss = bce_with_logits(bag_logits, bag_label, pos_weight)
    max_loss = bce_with_logits(max_logits, bag_label, pos_weight)
    loss = w * bag_loss + (1.0 - w) * max_loss
    bag_score = (1.0 - w) * jax.nn.sigmoid(max_logits) + w * jax.nn.sigmoid(
        bag_logits
    )
    return loss, bag_score


def packed_mixed_mil_loss(
    ins_logits: jnp.ndarray,   # (k·N, C) — k bags packed on the row axis
    bag_logits: jnp.ndarray,   # (k, C)
    bag_labels: jnp.ndarray,   # (k, C)
    mask: jnp.ndarray,         # (k·N,)
    w: jnp.ndarray,            # scalar in [0, 1]
    pos_weight: Optional[jnp.ndarray] = None,
    *,
    segments: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bag `mixed_mil_loss` over a packed forward's outputs.

    Returns (losses (k,), bag_scores (k, C)) — identical per bag to calling
    `mixed_mil_loss` on each bag's slice (it IS that call, vmapped over the
    unpacked segment axis: the loss tail is elementwise/reduction-only, so
    the vmap-backward schedule penalty of the model graph does not apply).
    """
    kn, c = ins_logits.shape
    n = kn // segments
    return jax.vmap(
        mixed_mil_loss, in_axes=(0, 0, 0, 0, None, None)
    )(
        ins_logits.reshape(segments, n, c),
        bag_logits,
        bag_labels,
        mask.reshape(segments, n),
        w,
        pos_weight,
    )
