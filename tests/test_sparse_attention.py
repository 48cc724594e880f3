"""Parity tests: inverted sparse attention vs the numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.ops.sparse_attention import inverted_sparse_attention
from tests.oracle import inverted_attention_oracle


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_attention_matches_oracle_unpadded():
    n, s, d, h = 37, 9, 32, 4
    q, k, v = _rand((n, d), 0), _rand((s, d), 1), _rand((n, d), 2)
    dk = d // h

    def split(t):
        return jnp.asarray(t).reshape(t.shape[0], h, dk).transpose(1, 0, 2)

    out, p = inverted_sparse_attention(
        split(q), split(k), split(v),
        jnp.ones(s, bool), jnp.ones(n, bool),
    )
    out = np.asarray(out.transpose(1, 0, 2).reshape(s, d))
    exp_out, exp_p = inverted_attention_oracle(q, k, v, h)
    np.testing.assert_allclose(out, exp_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p), exp_p, rtol=2e-5, atol=2e-5)


def test_attention_padding_equivalence():
    """Masked computation on padded arrays == unpadded computation."""
    n, s, d, h = 20, 6, 16, 2
    n_pad, s_pad = 32, 10
    q, k, v = _rand((n, d), 3), _rand((s, d), 4), _rand((n, d), 5)
    qp = np.zeros((n_pad, d), np.float32)
    kp = np.random.default_rng(6).normal(size=(s_pad, d)).astype(np.float32)
    vp = np.zeros((n_pad, d), np.float32)
    qp[:n], kp[:s], vp[:n] = q, k, v  # garbage beyond s in kp on purpose
    q_valid = np.arange(n_pad) < n
    s_valid = np.arange(s_pad) < s
    dk = d // h

    def split(t):
        return jnp.asarray(t).reshape(t.shape[0], h, dk).transpose(1, 0, 2)

    out_pad, p_pad = inverted_sparse_attention(
        split(qp), split(kp), split(vp), jnp.asarray(s_valid), jnp.asarray(q_valid)
    )
    out_pad = np.asarray(out_pad.transpose(1, 0, 2).reshape(s_pad, d))
    exp_out, exp_p = inverted_attention_oracle(q, k, v, h)
    np.testing.assert_allclose(out_pad[:s], exp_out, rtol=2e-5, atol=2e-5)
    # Dead query rows contribute nothing:
    np.testing.assert_allclose(np.asarray(p_pad)[:, n:, :], 0.0)
    np.testing.assert_allclose(
        np.asarray(p_pad)[:, :n, :s], exp_p, rtol=2e-5, atol=2e-5
    )


def test_attention_rows_not_value_normalized():
    """Guard the inverted semantics: output row j = Σ_i p[i,j]·v_i, whose
    total weight over i is NOT 1 — a standard-attention implementation
    would fail this test."""
    n, s, d, h = 8, 2, 4, 1
    q = np.zeros((n, d), np.float32)  # uniform attention: p[i,j] = 1/s
    k = _rand((s, d), 7)
    v = np.ones((n, d), np.float32)
    out, _ = inverted_sparse_attention(
        jnp.asarray(q)[None], jnp.asarray(k)[None], jnp.asarray(v)[None],
        jnp.ones(s, bool), jnp.ones(n, bool),
    )
    # Each output row = Σ_i (1/s)·1 = n/s, not 1.
    np.testing.assert_allclose(np.asarray(out), n / s, rtol=1e-5)


def test_attention_dropout_zero_mean_preserving():
    n, s, d, h = 64, 8, 16, 2
    q, k, v = _rand((n, d), 8), _rand((s, d), 9), _rand((n, d), 10)
    dk = d // h

    def split(t):
        return jnp.asarray(t).reshape(t.shape[0], h, dk).transpose(1, 0, 2)

    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    outs = jax.vmap(
        lambda rng: inverted_sparse_attention(
            split(q), split(k), split(v), jnp.ones(s, bool), jnp.ones(n, bool),
            dropout_rate=0.5, dropout_rng=rng,
        )[0]
    )(keys)
    mean = np.asarray(outs).mean(0)
    ref, _ = inverted_sparse_attention(
        split(q), split(k), split(v), jnp.ones(s, bool), jnp.ones(n, bool)
    )
    ref = np.asarray(ref)
    # Inverted-dropout scaling keeps the expectation.
    np.testing.assert_allclose(mean, ref, atol=0.35)
