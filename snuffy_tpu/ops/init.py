"""Weight-initializer registry matching the reference's distributions.

The reference applies `utils.WEIGHT_INITS[name]` to every Linear/Conv1d in
i_classifier / b_classifier (weight ← init, bias ← 0; reference
utils.py:69-130, train.py:199-213). Distribution equivalences for a Dense
kernel of shape (in, out) vs torch's (out, in):

  xavier_normal / xavier_uniform  → glorot_normal / glorot_uniform
  kaiming_normal / kaiming_uniform → he_normal / he_uniform (fan_in, √2 gain)
  trunc_normal                    → truncated_normal(std=1, ±2 truncation)
  orthogonal                      → trunc_normal (sic — the reference's
                                    utils.orthogonal_ calls trunc_normal_,
                                    utils.py:114-120, and utils.WEIGHT_INITS
                                    is the last init applied, so that quirk
                                    is the effective behavior)
"""

from __future__ import annotations

import jax


def _trunc_normal(key, shape, dtype=None):
    # dtype defaulted like jax's builtin initializers: flax's
    # module.param() calls init(key, shape) with no dtype when the caller
    # passes only a shape (e.g. models/snuffy.py _ProjParams).
    import jax.numpy as jnp

    return jax.nn.initializers.truncated_normal(stddev=1.0)(
        key, shape, jnp.float32 if dtype is None else dtype)


WEIGHT_INITS = {
    "xavier_normal": jax.nn.initializers.glorot_normal(),
    "xavier_uniform": jax.nn.initializers.glorot_uniform(),
    "kaiming_normal": jax.nn.initializers.he_normal(),
    "kaiming_uniform": jax.nn.initializers.he_uniform(),
    "trunc_normal": _trunc_normal,
    "orthogonal": _trunc_normal,  # reference quirk, see module docstring
}


def get_weight_init(name: str):
    try:
        return WEIGHT_INITS[name]
    except KeyError:
        raise KeyError(
            f"Weight init not found. Given: {name}, Have: {list(WEIGHT_INITS)}"
        )
