"""LARS optimizer + layer-wise LR decay, as optax transforms.

Covers the reference's remaining optimizer surface:
  * LARS (reference dino_adapter/utils.py:567-607, used for ConvNet DINO
    backbones): layer-wise trust-ratio scaling of SGD-momentum updates,
    weight decay skipped for 1-D params;
  * layer-wise LR decay (reference mae_adapter/util/lr_decay.py: per-block
    multiplicative decay `lr_scale = decay^(n_layers − block_id)` for ViT
    fine-tuning).
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LarsState(NamedTuple):
    momentum: Any


def lars(
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eta: float = 0.001,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Returns the positive descent direction (caller applies −lr).

    update = m_t where m_t = momentum·m_{t−1} + local_lr·(g + wd·p) and
    local_lr = eta·‖p‖/‖g + wd·p‖ for params with ndim > 1 (1-D params and
    biases skip both decay and trust scaling — the reference's
    exclude-bias-and-norm behavior).
    """

    def init(params):
        return LarsState(jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        def one(g, m, p):
            if p.ndim <= 1:
                d = g
            else:
                d = g + weight_decay * p
                p_norm = jnp.linalg.norm(p)
                d_norm = jnp.linalg.norm(d)
                trust = jnp.where(
                    (p_norm > 0) & (d_norm > 0),
                    eta * p_norm / (d_norm + eps),
                    1.0,
                )
                d = d * trust
            return momentum * m + d

        new_m = jax.tree_util.tree_map(one, grads, state.momentum, params)
        return new_m, LarsState(new_m)

    return optax.GradientTransformation(init, update)


_BLOCK_RE = re.compile(r"blocks?_(\d+)")


def vit_layer_id(path_names, num_layers: int) -> int:
    """MAE lr_decay layer ids: embed/cls/pos → 0, blocks_i → i+1, the rest
    (norm/head) → num_layers (reference mae_adapter/util/lr_decay.py)."""
    joined = "/".join(path_names)
    if any(n in ("cls_token", "pos_embed", "patch_embed") for n in path_names):
        return 0
    m = _BLOCK_RE.search(joined)
    if m:
        return int(m.group(1)) + 1
    return num_layers


def layerwise_lr_decay_mask(params, num_layers: int, decay: float):
    """Pytree of per-leaf LR multipliers decay^(num_layers − layer_id)."""

    def one(path, _):
        names = [str(p.key if hasattr(p, "key") else p) for p in path]
        lid = vit_layer_id(names, num_layers)
        return decay ** (num_layers - lid)

    return jax.tree_util.tree_map_with_path(one, params)


def scale_by_layerwise_lr(params, num_layers: int, decay: float
                          ) -> optax.GradientTransformation:
    """Multiply updates by their layer's decayed LR factor."""
    factors = layerwise_lr_decay_mask(params, num_layers, decay)

    def init(_):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return (
            jax.tree_util.tree_map(lambda u, f: u * f, updates, factors),
            state,
        )

    return optax.GradientTransformation(init, update)
