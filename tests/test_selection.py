"""Unit tests for the static-shape Λ-selection ops."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.ops.selection import (
    binary_lambda_selection,
    gumbel_without_replacement,
    multiclass_lambda_selection,
    top_share_selection,
)
from tests.oracle import reference_multiclass_selection


def test_top_share_matches_argsort():
    rng = np.random.default_rng(0)
    c = rng.normal(size=64).astype(np.float32)
    valid = np.ones(64, bool)
    sel = top_share_selection(jnp.asarray(c), jnp.asarray(valid), 10)
    expected = np.argsort(-c, kind="stable")[:10]
    np.testing.assert_array_equal(np.asarray(sel.indices), expected)
    assert np.all(np.asarray(sel.slot_valid))


def test_top_share_respects_padding():
    rng = np.random.default_rng(1)
    c = rng.normal(size=64).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:7] = True  # only 7 valid tokens, ask for 10
    sel = top_share_selection(jnp.asarray(c), jnp.asarray(valid), 10)
    sv = np.asarray(sel.slot_valid)
    assert sv[:7].all() and not sv[7:].any()
    expected = np.argsort(-c[:7], kind="stable")
    np.testing.assert_array_equal(np.asarray(sel.indices)[:7], expected)


def test_gumbel_without_replacement_is_uniform_and_distinct():
    n, k, trials = 32, 8, 3000
    allowed = np.zeros(n, bool)
    allowed[4:28] = True
    keys = jax.random.split(jax.random.PRNGKey(0), trials)
    sels = jax.vmap(
        lambda k_: gumbel_without_replacement(k_, jnp.asarray(allowed), k)
    )(keys)
    all_idx = np.asarray(sels.indices)  # (trials, k)
    assert np.asarray(sels.slot_valid).all()
    counts = np.zeros(n)
    for idx in all_idx:
        assert len(set(idx.tolist())) == k  # without replacement
        assert allowed[idx].all()
        counts[idx] += 1
    # Each allowed position should appear ~ trials*k/24 times.
    expected = trials * k / allowed.sum()
    observed = counts[allowed]
    assert np.abs(observed - expected).max() < 5 * np.sqrt(expected)


def test_binary_selection_structure():
    big_lambda, rho = 12, 0.5
    k_top = math.ceil(big_lambda * (1 - rho))
    k_rand = int(big_lambda * rho)
    rng = np.random.default_rng(2)
    n_pad, n_valid = 64, 40
    c = rng.normal(size=n_pad).astype(np.float32)
    valid = np.arange(n_pad) < n_valid
    sel = binary_lambda_selection(
        jax.random.PRNGKey(3), jnp.asarray(c), jnp.asarray(valid), k_top, k_rand
    )
    idx, sv = np.asarray(sel.indices), np.asarray(sel.slot_valid)
    # Top share equals the argsort prefix over valid tokens.
    expected_top = np.argsort(-np.where(valid, c, -np.inf), kind="stable")[:k_top]
    np.testing.assert_array_equal(idx[:k_top], expected_top)
    # Random share: valid, distinct, disjoint from top share.
    rand = idx[k_top:][sv[k_top:]]
    assert len(rand) == k_rand
    assert len(set(rand.tolist())) == k_rand
    assert not (set(rand.tolist()) & set(expected_top.tolist()))
    assert (rand < n_valid).all()


def test_binary_selection_small_bag_caps_random_share():
    # Reference rule (snuffy.py:137-140): k_rand_eff = min(k_rand, n - k_top).
    big_lambda, rho = 12, 0.5
    k_top, k_rand = 6, 6
    n_pad, n_valid = 16, 9  # only 3 tokens remain after the top share
    c = np.random.default_rng(4).normal(size=n_pad).astype(np.float32)
    valid = np.arange(n_pad) < n_valid
    sel = binary_lambda_selection(
        jax.random.PRNGKey(5), jnp.asarray(c), jnp.asarray(valid), k_top, k_rand
    )
    sv = np.asarray(sel.slot_valid)
    assert sv[:k_top].all()
    assert sv[k_top:].sum() == n_valid - k_top  # 3


def test_binary_selection_bag_smaller_than_top_share():
    # n_valid < k_top: all valid tokens selected, everything else dead.
    k_top, k_rand = 10, 0
    n_pad, n_valid = 16, 4
    c = np.random.default_rng(6).normal(size=n_pad).astype(np.float32)
    valid = np.arange(n_pad) < n_valid
    sel = binary_lambda_selection(
        jax.random.PRNGKey(7), jnp.asarray(c), jnp.asarray(valid), k_top, k_rand
    )
    idx, sv = np.asarray(sel.indices), np.asarray(sel.slot_valid)
    assert sv.sum() == n_valid
    assert set(idx[sv].tolist()) == set(range(n_valid))


@pytest.mark.parametrize("n_valid", [30, 64])
def test_multiclass_selection_matches_reference_rule(n_valid):
    big_lambda, rho, num_classes = 10, 0.5, 3
    k_top = math.ceil(big_lambda * (1 - rho))
    n_pad = 64
    rng = np.random.default_rng(8)
    c = rng.normal(size=(n_pad, num_classes)).astype(np.float32)
    valid = np.arange(n_pad) < n_valid
    c_valid = c[:n_valid]

    sel, ref_dim = multiclass_lambda_selection(
        jax.random.PRNGKey(9), jnp.asarray(c), jnp.asarray(valid), k_top
    )
    expected_top, expected_ref_dim, union = reference_multiclass_selection(
        c_valid, big_lambda, rho
    )
    assert int(ref_dim) == expected_ref_dim
    idx, sv = np.asarray(sel.indices), np.asarray(sel.slot_valid)
    s_half = len(idx) // 2
    top = idx[:s_half][sv[:s_half]]
    np.testing.assert_array_equal(top, expected_top)
    # Random half: distinct, valid, disjoint from the FULL union.
    rand = idx[s_half:][sv[s_half:]]
    assert len(rand) == expected_ref_dim
    assert len(set(rand.tolist())) == expected_ref_dim
    assert not (set(rand.tolist()) & set(union.tolist()))
    assert (rand < n_valid).all()


def test_selection_bucket_smaller_than_lambda():
    """Λ larger than the whole bucket (e.g. Λ=500 on a 64-token MUSK bag):
    the reference sizes its shares dynamically (snuffy.py:136-143); the
    static-shape path must keep S slots and mark the surplus invalid."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from snuffy_tpu.ops.selection import binary_lambda_selection

    n, k_top, k_rand = 40, 250, 250
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    valid = jnp.asarray(np.arange(n) < 30)
    sel = binary_lambda_selection(jax.random.PRNGKey(0), logits, valid,
                                  k_top, k_rand)
    assert sel.indices.shape == (k_top + k_rand,)
    assert sel.slot_valid.shape == (k_top + k_rand,)
    # exactly the 30 valid tokens are selected across both shares, once each
    chosen = np.asarray(sel.indices)[np.asarray(sel.slot_valid)]
    assert sorted(chosen.tolist()) == list(range(30))
