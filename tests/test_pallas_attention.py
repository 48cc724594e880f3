"""Fused Pallas sparse-attention kernel vs the XLA oracle — forward and
gradients, with ragged padding (runs in interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.ops.pallas_attention import fused_inverted_sparse_attention
from snuffy_tpu.ops.sparse_attention import inverted_sparse_attention


def make_inputs(h=2, n=300, s=20, dk=24, n_valid=None, s_valid=None, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h, s, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    n_valid = n if n_valid is None else n_valid
    s_valid = s if s_valid is None else s_valid
    q_mask = jnp.asarray(np.arange(n) < n_valid)
    k_mask = jnp.asarray(np.arange(s) < s_valid)
    return q, k, v, k_mask, q_mask


@pytest.mark.parametrize(
    "shape",
    [
        dict(h=2, n=300, s=20, dk=24),
        dict(h=1, n=600, s=130, dk=96, n_valid=517, s_valid=100),
        dict(h=4, n=128, s=8, dk=16, n_valid=100),
    ],
)
def test_fused_forward_matches_oracle(shape):
    q, k, v, k_mask, q_mask = make_inputs(**shape)
    expected, _ = inverted_sparse_attention(q, k, v, k_mask, q_mask)
    got = fused_inverted_sparse_attention(q, k, v, k_mask, q_mask, tile_n=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_oracle():
    q, k, v, k_mask, q_mask = make_inputs(h=2, n=280, s=12, dk=16,
                                          n_valid=250, s_valid=10, seed=3)

    def loss_fused(q, k, v):
        out = fused_inverted_sparse_attention(q, k, v, k_mask, q_mask,
                                              tile_n=128)
        return jnp.sum(jnp.sin(out))

    def loss_oracle(q, k, v):
        out, _ = inverted_sparse_attention(q, k, v, k_mask, q_mask)
        return jnp.sum(jnp.sin(out))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, go, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5,
            err_msg=f"grad d{name} mismatch",
        )


def test_fused_dead_rows_and_slots_are_zero():
    q, k, v, k_mask, q_mask = make_inputs(h=1, n=64, s=16, dk=8,
                                          n_valid=40, s_valid=9)
    out = fused_inverted_sparse_attention(q, k, v, k_mask, q_mask, tile_n=64)
    # Slots beyond s_valid aggregate nothing.
    np.testing.assert_allclose(np.asarray(out)[:, 9:, :], 0.0, atol=1e-6)


def test_fused_dropout_determinism_and_scaling():
    import jax.numpy as jnp

    q, k, v, k_mask, q_mask = make_inputs(h=2, n=256, s=16, dk=16, seed=5)
    seed_a = jnp.asarray(123, jnp.int32)
    seed_b = jnp.asarray(456, jnp.int32)

    base = fused_inverted_sparse_attention(q, k, v, k_mask, q_mask, tile_n=128)
    da1 = fused_inverted_sparse_attention(
        q, k, v, k_mask, q_mask, dropout_rate=0.5, dropout_seed=seed_a,
        tile_n=128)
    da2 = fused_inverted_sparse_attention(
        q, k, v, k_mask, q_mask, dropout_rate=0.5, dropout_seed=seed_a,
        tile_n=128)
    db = fused_inverted_sparse_attention(
        q, k, v, k_mask, q_mask, dropout_rate=0.5, dropout_seed=seed_b,
        tile_n=128)

    np.testing.assert_array_equal(np.asarray(da1), np.asarray(da2))
    assert not np.allclose(np.asarray(da1), np.asarray(db))
    assert not np.allclose(np.asarray(da1), np.asarray(base))
    # inverted-scaling keeps the aggregate roughly unbiased
    ratio = np.abs(np.asarray(da1)).mean() / np.abs(np.asarray(base)).mean()
    assert 0.6 < ratio < 1.6

    def loss(q, k, v):
        out = fused_inverted_sparse_attention(
            q, k, v, k_mask, q_mask, dropout_rate=0.5, dropout_seed=seed_a,
            tile_n=128)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_fused_dropout_keep_rate():
    """Empirical keep fraction of the hash mask ≈ 1 − rate."""
    from snuffy_tpu.ops.pallas_attention import _keep_factor
    import jax.numpy as jnp

    f = _keep_factor(jnp.int32(7), jnp.int32(0), jnp.int32(0), 512, 128, 0.3)
    keep_frac = float((np.asarray(f) > 0).mean())
    assert abs(keep_frac - 0.7) < 0.02


def test_fit_tile_n_vmem_guard():
    """The backward kernel's scoped VMEM holds ~two f32 (tile_n, s_p)
    score blocks; at the Λ=900 recipe (s_p=1024) the 2048 default tile
    was a 20.3 MB scoped allocation — a hard compile error on real TPU
    that interpret mode cannot see. The guard halves the tile until the
    blocks fit."""
    from snuffy_tpu.ops.pallas_attention import _fit_tile_n

    assert _fit_tile_n(2048, 512) == 2048   # Λ≤512: untouched
    assert _fit_tile_n(2048, 1024) == 1024  # Λ=900 (padded 1024): halved
    assert _fit_tile_n(1024, 1024) == 1024
    assert _fit_tile_n(2048, 4096) == 256   # floor


def test_kernel_matches_oracle_at_lambda_900():
    """Kernel vs XLA oracle at the DINO-scratch recipe's selection width
    (Λ=900 → S=900 slots, beyond the 512 every other test uses)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.ops.pallas_attention import fused_inverted_sparse_attention
    from snuffy_tpu.ops.sparse_attention import inverted_sparse_attention

    h, n, dk, s = 2, 1536, 96, 900
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h, s, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    slot_valid = jnp.asarray(np.arange(s) < 880)
    q_valid = jnp.asarray(np.arange(n) < 1400)

    ref, _ = inverted_sparse_attention(q, k, v, slot_valid, q_valid)
    out = fused_inverted_sparse_attention(q, k, v, slot_valid, q_valid,
                                          tile_n=2048)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
