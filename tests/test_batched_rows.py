"""Parity of the flat-under-vmap row ops (ops/batched_rows.py) against the
naive jnp formulations they replace, in forward and backward, single-bag
and batched — the batched-bags training mode depends on these being exact
(reference semantics: snuffy.py:152-155 in-place row update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.ops.experimental.batched_rows import gather_rows, scatter_set_rows

B, N, S, D = 3, 40, 12, 5


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    rows = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    # unique per-bag indices with some sentinel (dropped) entries == N
    si = np.stack([rng.choice(N, S, replace=False) for _ in range(B)])
    si[:, -3:] = N
    idx = np.stack([rng.choice(N, S, replace=False) for _ in range(B)])
    return x, rows, jnp.asarray(si, jnp.int32), jnp.asarray(idx, jnp.int32)


def naive_scatter(x, si, rows):
    return x.at[si].set(rows, mode="drop")


def test_scatter_forward_single_and_batched(data):
    x, rows, si, _ = data
    single = scatter_set_rows(x[0], si[0], rows[0])
    np.testing.assert_allclose(single, naive_scatter(x[0], si[0], rows[0]))
    batched = jax.jit(jax.vmap(scatter_set_rows))(x, si, rows)
    np.testing.assert_allclose(batched, jax.vmap(naive_scatter)(x, si, rows))


def test_scatter_grads_match_naive(data):
    x, rows, si, _ = data

    def loss(f, x, rows):
        out = jax.vmap(f)(x, si, rows)
        return jnp.sum(out * jnp.sin(out))

    g = jax.jit(jax.grad(lambda x, r: loss(scatter_set_rows, x, r), (0, 1)))(
        x, rows
    )
    gr = jax.grad(lambda x, r: loss(naive_scatter, x, r), (0, 1))(x, rows)
    np.testing.assert_allclose(g[0], gr[0], rtol=1e-6)
    np.testing.assert_allclose(g[1], gr[1], rtol=1e-6)


def test_gather_forward_and_grads(data):
    x, _, _, idx = data
    np.testing.assert_allclose(
        gather_rows(x[0], idx[0]), jnp.take(x[0], idx[0], axis=0)
    )
    np.testing.assert_allclose(
        jax.vmap(gather_rows)(x, idx),
        jax.vmap(lambda x, i: jnp.take(x, i, axis=0))(x, idx),
    )

    def loss(f, x):
        out = jax.vmap(f)(x, idx)
        return jnp.sum(out**2)

    g = jax.jit(jax.grad(lambda x: loss(gather_rows, x)))(x)
    gr = jax.grad(lambda x: loss(lambda x, i: jnp.take(x, i, axis=0), x))(x)
    np.testing.assert_allclose(g, gr, rtol=1e-6)


def test_gather_grad_accumulates_duplicates():
    x = jnp.arange(12.0).reshape(6, 2)
    idx = jnp.asarray([2, 2, 5], jnp.int32)
    g = jax.grad(lambda x: jnp.sum(gather_rows(x, idx)))(x)
    expect = jnp.zeros_like(x).at[idx].add(1.0)
    np.testing.assert_allclose(g, expect)


def test_model_forward_parity_batched_vs_serial():
    """The wired-in ops must leave the model bit-identical: vmapped forward
    rows == per-bag forward."""
    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params

    cfg = SnuffyModelConfig(
        feats_size=16, num_heads=2, big_lambda=8, random_patch_share=0.5,
        depth=2, use_pallas=False,
    )
    model = build_milnet(cfg)
    params = init_milnet_params(cfg, seed=0, n_example=24)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((4, 24, 16)), jnp.float32)
    masks = jnp.asarray(np.arange(24)[None] < 20).repeat(4, axis=0)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)

    def fwd(f, m, k):
        ins, bag, _ = model.apply(
            {"params": params}, f, m, True, rngs={"sparse": k}
        )
        return ins, bag

    ins_b, bag_b = jax.jit(jax.vmap(fwd))(feats, masks, keys)
    for i in range(4):
        ins_i, bag_i = fwd(feats[i], masks[i], keys[i])
        np.testing.assert_allclose(ins_b[i], ins_i, atol=1e-5)
        np.testing.assert_allclose(bag_b[i], bag_i, atol=1e-5)
