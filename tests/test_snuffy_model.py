"""End-to-end model parity vs the numpy oracle, plus padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.configs import SnuffyModelConfig
from snuffy_tpu.models.snuffy import MILNet, init_milnet_params
from tests.oracle import milnet_oracle


def _to_np(tree):
    return jax.tree.map(np.asarray, tree)


def _apply(cfg, params, feats, mask, seed=0, deterministic=True):
    model = MILNet(cfg)
    rngs = {"sparse": jax.random.PRNGKey(seed)}
    if not deterministic:
        rngs["dropout"] = jax.random.PRNGKey(seed + 1)
    (ins, bag, p_attn), inter = model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(mask),
        deterministic, rngs=rngs, mutable=["intermediates"],
    )
    return ins, bag, p_attn, inter["intermediates"]


def _collect_selections(inter, depth):
    """Valid selected indices per layer, in slot order."""
    sels = []
    enc = inter["b_classifier"]["encoder"]
    for i in range(depth):
        layer = enc[f"layer_{i}"]
        idx = np.asarray(layer["sel_indices"][0])
        sv = np.asarray(layer["sel_valid"][0])
        sels.append(idx[sv])
    return sels


@pytest.mark.parametrize("depth", [1, 3])
@pytest.mark.parametrize("rho", [0.0, 0.5])
def test_milnet_matches_oracle_with_padding(depth, rho):
    cfg = SnuffyModelConfig(
        feats_size=32, num_classes=1, num_heads=4, big_lambda=10,
        random_patch_share=rho, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth,
    )
    n_valid, n_pad = 25, 40
    rng = np.random.default_rng(0)
    feats = np.zeros((n_pad, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.normal(size=(n_valid, cfg.feats_size))
    mask = np.arange(n_pad) < n_valid

    params = init_milnet_params(cfg, seed=1, n_example=n_pad)
    ins, bag, p_attn, inter = _apply(cfg, params, feats, mask)
    sels = _collect_selections(inter, depth)
    for s in sels:
        assert (s < n_valid).all()

    pnp = _to_np(params)
    exp_ins, exp_bag, _ = milnet_oracle(
        feats[:n_valid], pnp, sels, cfg.num_heads, depth=depth
    )
    np.testing.assert_allclose(
        np.asarray(ins)[:n_valid], exp_ins, rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(np.asarray(bag), exp_bag, rtol=3e-4, atol=3e-5)


def test_milnet_padding_invariance_deterministic():
    """With ρ=0 the forward is selection-deterministic: the same bag padded
    to two different bucket sizes must give identical outputs."""
    cfg = SnuffyModelConfig(
        feats_size=16, num_classes=1, num_heads=2, big_lambda=8,
        random_patch_share=0.0, mlp_multiplier=2, attention_dropout=0.0,
    )
    n_valid = 21
    rng = np.random.default_rng(3)
    bag = rng.normal(size=(n_valid, cfg.feats_size)).astype(np.float32)
    params = init_milnet_params(cfg, seed=2, n_example=32)

    outs = []
    for n_pad in (32, 64):
        feats = np.zeros((n_pad, cfg.feats_size), np.float32)
        feats[:n_valid] = bag
        mask = np.arange(n_pad) < n_valid
        ins, bag_logit, _, _ = _apply(cfg, params, feats, mask)
        outs.append((np.asarray(ins)[:n_valid], np.asarray(bag_logit)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-6)


def test_milnet_multiclass_matches_oracle():
    cfg = SnuffyModelConfig(
        feats_size=32, num_classes=3, num_heads=4, big_lambda=8,
        random_patch_share=0.5, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=2, multiclass=True,
    )
    n_valid, n_pad = 30, 48
    rng = np.random.default_rng(5)
    feats = np.zeros((n_pad, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.normal(size=(n_valid, cfg.feats_size))
    mask = np.arange(n_pad) < n_valid

    params = init_milnet_params(cfg, seed=4, n_example=n_pad)
    ins, bag, _, inter = _apply(cfg, params, feats, mask)
    sels = _collect_selections(inter, cfg.depth)
    for s in sels:
        assert (s < n_valid).all()
        assert len(set(s.tolist())) == len(s)  # no scatter collisions

    pnp = _to_np(params)
    exp_ins, exp_bag, _ = milnet_oracle(
        feats[:n_valid], pnp, sels, cfg.num_heads, depth=cfg.depth
    )
    np.testing.assert_allclose(
        np.asarray(ins)[:n_valid], exp_ins, rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(np.asarray(bag), exp_bag, rtol=3e-4, atol=3e-5)


def test_milnet_full_bag_no_padding():
    """Λ ≥ N selects everything; works unpadded too."""
    cfg = SnuffyModelConfig(
        feats_size=16, num_classes=1, num_heads=2, big_lambda=64,
        random_patch_share=0.0, attention_dropout=0.0,
    )
    n = 12
    feats = np.random.default_rng(6).normal(size=(n, 16)).astype(np.float32)
    params = init_milnet_params(cfg, seed=5, n_example=n)
    ins, bag, _, inter = _apply(cfg, params, feats, np.ones(n, bool))
    sels = _collect_selections(inter, 1)
    assert set(sels[0].tolist()) == set(range(n))
    pnp = _to_np(params)
    exp_ins, exp_bag, _ = milnet_oracle(feats, pnp, sels, cfg.num_heads)
    np.testing.assert_allclose(np.asarray(bag), exp_bag, rtol=3e-4, atol=3e-5)


def test_milnet_gradients_finite():
    cfg = SnuffyModelConfig(
        feats_size=16, num_classes=1, num_heads=2, big_lambda=8,
        random_patch_share=0.5, attention_dropout=0.1, encoder_dropout=0.1,
    )
    n = 32
    feats = jnp.asarray(
        np.random.default_rng(7).normal(size=(n, 16)).astype(np.float32)
    )
    mask = jnp.ones(n, bool)
    params = init_milnet_params(cfg, seed=6, n_example=n)
    model = MILNet(cfg)

    def loss_fn(p):
        ins, bag, _ = model.apply(
            {"params": p}, feats, mask, False,
            rngs={"sparse": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(bag**2) + jnp.sum(ins**2)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # The b_classifier attention weights must receive gradient.
    g_wq = grads["b_classifier"]["encoder"]["layer_0"]["attn"]["wq"]["kernel"]
    assert float(jnp.abs(g_wq).sum()) > 0


def test_milnet_bfloat16_close_to_float32():
    """bf16 compute path tracks f32 within bf16 tolerance; output dtypes and
    losses stay float32-safe."""
    base = dict(
        feats_size=64, num_classes=1, num_heads=4, big_lambda=16,
        random_patch_share=0.0, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=2,
    )
    cfg32 = SnuffyModelConfig(**base)
    cfg16 = SnuffyModelConfig(**base, compute_dtype="bfloat16")
    n = 96
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, 64)).astype(np.float32)
    mask = np.ones(n, bool)
    params = init_milnet_params(cfg32, seed=1, n_example=n)

    ins32, bag32, _, _ = _apply(cfg32, params, feats, mask)
    ins16, bag16, _, _ = _apply(cfg16, params, feats, mask)
    np.testing.assert_allclose(
        np.asarray(bag16, np.float32), np.asarray(bag32), rtol=0.1, atol=0.05
    )
    # instance logits are computed in f32 (the i_classifier is not cast)
    np.testing.assert_allclose(
        np.asarray(ins16), np.asarray(ins32), rtol=1e-4, atol=1e-5
    )


def test_remat_encoder_identical_outputs_and_grads():
    """cfg.remat wraps each EncoderLayer in jax.checkpoint: forward and
    gradients must be bit-compatible with the non-remat model (the trade
    is HBM for recompute FLOPs, not numerics) — the long-bag path of
    SURVEY §5 'long-context handling'."""
    base = dict(feats_size=32, num_classes=1, num_heads=4, big_lambda=8,
                random_patch_share=0.5, depth=2, use_pallas=False)
    cfgA = SnuffyModelConfig(**base)
    cfgB = SnuffyModelConfig(**base, remat=True)
    n = 64
    params = init_milnet_params(cfgA, seed=0, n_example=n)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, 32)), jnp.float32
    )
    mask = jnp.asarray(np.arange(n) < 50)
    from snuffy_tpu.models.snuffy import build_milnet

    mA, mB = build_milnet(cfgA), build_milnet(cfgB)
    rngs = {"sparse": jax.random.PRNGKey(1)}

    outA = mA.apply({"params": params}, feats, mask, True, rngs=rngs)
    outB = mB.apply({"params": params}, feats, mask, True, rngs=rngs)
    np.testing.assert_allclose(np.asarray(outA[1]), np.asarray(outB[1]),
                               rtol=1e-6)

    def grads(m):
        def f(p):
            _, bag, _ = m.apply({"params": p}, feats, mask, True, rngs=rngs)
            return jnp.sum(bag)
        return jax.grad(f)(params)

    for a, b in zip(jax.tree_util.tree_leaves(grads(mA)),
                    jax.tree_util.tree_leaves(grads(mB))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_every_weight_init_initializes():
    """Every registry init must work through BOTH param paths — nn.Dense
    (kernel_init called with (key, shape, dtype)) and the fused-q/v
    _ProjParams (self.param calls init with (key, shape) only). A
    dtype-required init signature broke trunc_normal/orthogonal configs
    after the q/v GEMM fusion, invisibly to the fast suite because only
    RUN_SLOW recipe tests init with them."""
    from snuffy_tpu.ops.init import WEIGHT_INITS

    for name in WEIGHT_INITS:
        cfg = SnuffyModelConfig(
            feats_size=8, num_heads=2, big_lambda=4, depth=1,
            weight_init_i=name, weight_init_b=name,
            use_pallas=False,
        )
        params = init_milnet_params(cfg, seed=0, n_example=16)
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves and all(np.isfinite(np.asarray(l)).all()
                              for l in leaves), name
