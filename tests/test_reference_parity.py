"""Golden parity against the actual PyTorch reference implementation.

These tests import the reference repo (read-only, mounted at
/root/reference) as a torch oracle, copy its randomly-initialized weights
into the flax models, and compare forward outputs on identical bags. They
skip automatically when the reference checkout or torch is unavailable.

Determinism: ρ=0 (no random share) makes the binary Snuffy selection a pure
top-k, so both frameworks compute the same function.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    import dsmil as ref_dsmil
    import snuffy as ref_snuffy

    yield ref_snuffy, ref_dsmil
    sys.path.remove(REF)


def _t2n(t):
    return t.detach().cpu().numpy()


def snuffy_ref_to_flax(sd, depth):
    """Reference state dict → my flax param tree (torch (out,in) → (in,out))."""
    names = ["wq", "wk", "wv", "wo"]
    enc = {}
    for i in range(depth):
        p = f"b_classifier.encoder.layers.{i}"
        layer = {
            "attn": {
                names[j]: {
                    "kernel": _t2n(sd[f"{p}.self_attn.linears.{j}.weight"]).T,
                    "bias": _t2n(sd[f"{p}.self_attn.linears.{j}.bias"]),
                }
                for j in range(4)
            },
            "ff": {
                "w1": {"kernel": _t2n(sd[f"{p}.feed_forward.w_1.weight"]).T,
                       "bias": _t2n(sd[f"{p}.feed_forward.w_1.bias"])},
                "w2": {"kernel": _t2n(sd[f"{p}.feed_forward.w_2.weight"]).T,
                       "bias": _t2n(sd[f"{p}.feed_forward.w_2.bias"])},
            },
            "ln_attn": {"scale": _t2n(sd[f"{p}.sublayer.0.norm.weight"]),
                        "bias": _t2n(sd[f"{p}.sublayer.0.norm.bias"])},
            "ln_ff": {"scale": _t2n(sd[f"{p}.sublayer.1.norm.weight"]),
                      "bias": _t2n(sd[f"{p}.sublayer.1.norm.bias"])},
        }
        enc[f"layer_{i}"] = layer
    enc["ln_final"] = {
        "scale": _t2n(sd["b_classifier.encoder.norm.weight"]),
        "bias": _t2n(sd["b_classifier.encoder.norm.bias"]),
    }
    return {
        "i_classifier": {"fc": {
            "kernel": _t2n(sd["i_classifier.fc.0.weight"]).T,
            "bias": _t2n(sd["i_classifier.fc.0.bias"]),
        }},
        "b_classifier": {
            "encoder": enc,
            "linear": {"kernel": _t2n(sd["b_classifier.linear.weight"]).T,
                       "bias": _t2n(sd["b_classifier.linear.bias"])},
        },
    }


@pytest.mark.parametrize("depth", [1, 3])
def test_snuffy_binary_forward_parity(ref_modules, depth):
    import copy

    import jax
    import jax.numpy as jnp

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import MILNet

    ref_snuffy, _ = ref_modules
    d, heads, lam, n = 32, 4, 10, 40
    torch.manual_seed(0)
    i_cls = ref_snuffy.FCLayer(in_size=d, out_size=1)
    attn = ref_snuffy.MultiHeadedAttention(heads, d)
    ff = ref_snuffy.PositionwiseFeedForward(d, d * 2, "relu", 0.0)
    b_cls = ref_snuffy.BClassifier(
        ref_snuffy.Encoder(
            ref_snuffy.EncoderLayer(
                d, copy.deepcopy(attn), copy.deepcopy(ff), 0.0, lam, 0.0
            ),
            depth,
        ),
        1, d,
    )
    ref_model = ref_snuffy.MILNet(i_cls, b_cls).eval()
    # kill attention-prob dropout (train-mode-only anyway; eval() disables)

    rng = np.random.default_rng(0)
    bag = rng.normal(size=(n, d)).astype(np.float32)
    with torch.no_grad():
        # the reference trainer feeds (1, N, D) bags (train.py:255-256)
        ref_ins, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])

    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=1, num_heads=heads, big_lambda=lam,
        random_patch_share=0.0, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth, use_pallas=False,
    )
    params = snuffy_ref_to_flax(ref_model.state_dict(), depth)
    model = MILNet(cfg)
    ins, bag_logits, _ = model.apply(
        {"params": params},
        jnp.asarray(bag),
        jnp.ones((n,), bool),
        True,
        rngs={"sparse": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(ins), _t2n(ref_ins).reshape(n, 1), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(bag_logits), _t2n(ref_bag).reshape(-1),
        rtol=2e-3, atol=2e-4,
    )


def test_snuffy_parity_with_pallas_kernel(ref_modules):
    """Same comparison through the fused kernel path (interpret on CPU)."""
    import copy

    import jax
    import jax.numpy as jnp

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import MILNet

    ref_snuffy, _ = ref_modules
    d, heads, lam, n = 32, 2, 8, 30
    torch.manual_seed(1)
    ref_model = ref_snuffy.MILNet(
        ref_snuffy.FCLayer(d, 1),
        ref_snuffy.BClassifier(
            ref_snuffy.Encoder(
                ref_snuffy.EncoderLayer(
                    d,
                    copy.deepcopy(ref_snuffy.MultiHeadedAttention(heads, d)),
                    copy.deepcopy(
                        ref_snuffy.PositionwiseFeedForward(d, d * 2, "relu", 0.0)
                    ),
                    0.0, lam, 0.0,
                ),
                1,
            ),
            1, d,
        ),
    ).eval()
    rng = np.random.default_rng(3)
    bag = rng.normal(size=(n, d)).astype(np.float32)
    with torch.no_grad():
        _, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])

    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=1, num_heads=heads, big_lambda=lam,
        random_patch_share=0.0, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=1, use_pallas=True,
    )
    params = snuffy_ref_to_flax(ref_model.state_dict(), 1)
    _, bag_logits, _ = MILNet(cfg).apply(
        {"params": params}, jnp.asarray(bag), jnp.ones((n,), bool), True,
        rngs={"sparse": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(bag_logits), _t2n(ref_bag).reshape(-1),
        rtol=2e-3, atol=2e-4,
    )


def test_dsmil_forward_parity(ref_modules):
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.models.dsmil import MILNet as DsmilNet

    _, ref_dsmil = ref_modules
    d, c, n = 16, 3, 20
    torch.manual_seed(2)
    ref_model = ref_dsmil.MILNet(
        ref_dsmil.FCLayer(d, c),
        ref_dsmil.BClassifier(input_size=d, output_class=c),
    ).eval()
    rng = np.random.default_rng(5)
    bag = rng.normal(size=(n, d)).astype(np.float32)
    with torch.no_grad():
        ref_ins, ref_bag, ref_a = ref_model(torch.from_numpy(bag))

    sd = ref_model.state_dict()
    params = {
        "i_classifier": {"fc": {
            "kernel": _t2n(sd["i_classifier.fc.0.weight"]).T,
            "bias": _t2n(sd["i_classifier.fc.0.bias"]),
        }},
        "b_classifier": {
            "q1": {"kernel": _t2n(sd["b_classifier.q.0.weight"]).T,
                   "bias": _t2n(sd["b_classifier.q.0.bias"])},
            "q2": {"kernel": _t2n(sd["b_classifier.q.2.weight"]).T,
                   "bias": _t2n(sd["b_classifier.q.2.bias"])},
            "fcc_kernel": _t2n(sd["b_classifier.fcc.weight"]),
            "fcc_bias": _t2n(sd["b_classifier.fcc.bias"]),
        },
    }
    model = DsmilNet(feats_size=d, num_classes=c)
    ins, bag_logits, a = model.apply(
        {"params": params}, jnp.asarray(bag), jnp.ones((n,), bool)
    )
    np.testing.assert_allclose(np.asarray(ins), _t2n(ref_ins),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), _t2n(ref_a),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bag_logits), _t2n(ref_bag).reshape(-1),
        rtol=1e-4, atol=1e-5,
    )


@pytest.fixture(scope="module")
def ref_dino_vit():
    """Reference DINO ViT (utils_ssls_cf/vision_transformer_dino.py) with its
    skimage-needing `utils` import stubbed to just trunc_normal_."""
    import importlib.util
    import types

    stub = types.ModuleType("utils")
    stub.trunc_normal_ = torch.nn.init.trunc_normal_
    saved = sys.modules.get("utils")
    sys.modules["utils"] = stub
    spec = importlib.util.spec_from_file_location(
        "vits_dino", os.path.join(REF, "utils_ssls_cf",
                                  "vision_transformer_dino.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    if saved is not None:
        sys.modules["utils"] = saved
    else:
        sys.modules.pop("utils", None)


def test_dino_vit_embedder_parity(ref_dino_vit):
    """Reference DINO ViT CLS output == my flax ViT with weights imported
    through the torch-checkpoint path (validates model AND importer)."""
    import jax

    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.vit import vit_tiny

    torch.manual_seed(0)
    ref_model = ref_dino_vit.vit_tiny(patch_size=16).eval()
    x = np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = vit_tiny(patch_size=16, output="cls")
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
    )["params"]
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    imported = ti.import_vit(sd)
    matched, mismatched = ti.check_layers(imported, template)
    assert mismatched == [], f"missing: {mismatched}"
    out = model.apply({"params": imported}, jnp.asarray(x), True)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().numpy(), rtol=2e-3, atol=2e-4
    )


@pytest.fixture(scope="module")
def ref_mae_normal():
    """Reference MAE inference model (utils_ssls_cf/models_mae_normal.py),
    with its timm/torchvision/skimage-era imports shimmed."""
    import types

    if not hasattr(np, "float"):
        np.float = float  # timm 0.3.2 era alias
    stub = types.ModuleType("utils")
    stub.trunc_normal_ = torch.nn.init.trunc_normal_
    sys.modules["utils"] = stub
    for name in ["torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"]
    timm_pkg = types.ModuleType("timm")
    timm_pkg.__path__ = [os.path.join(REF, "mae_adapter", "timm_modified")]
    timm_pkg.__version__ = "0.3.2"
    sys.modules["timm"] = timm_pkg
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "utils_ssls_cf"))
    import models_mae_normal as mm

    yield mm
    sys.path.remove(REF)
    sys.path.remove(os.path.join(REF, "utils_ssls_cf"))


def test_mae_embedder_parity(ref_mae_normal):
    """Reference MAE mean-pool embedder == my embed_tokens on imported
    weights (also validates the fixed sin-cos pos embed)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.mae import MaskedAutoencoderViT

    torch.manual_seed(0)
    ref_model = ref_mae_normal.mae_vit_base_patch16().eval()
    x = np.random.default_rng(1).normal(size=(2, 224, 224, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    # The reference's "normal" MAE still instantiates adapters and its
    # initialize_weights() xavier-overwrites their LoRA zero-init — so the
    # oracle runs ACTIVE random adapters (scale 0.1); import them too.
    model = MaskedAutoencoderViT(
        img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12,
        use_adapter=True, adapter_bottleneck=64, adapter_scale=0.1,
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    imported = ti.import_mae(sd)
    variables = {"params": imported}
    out = model.apply(
        variables, jnp.asarray(x),
        method=MaskedAutoencoderViT.embed_tokens,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().numpy(), rtol=2e-3, atol=2e-4
    )


def test_snuffy_random_share_parity(ref_modules):
    """Parity WITH the random share: run my model first, read its realized
    per-layer selection, then feed those exact random picks into the
    reference by proxying its module-level np.random.choice."""
    import copy
    import types

    import jax
    import jax.numpy as jnp

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import MILNet

    ref_snuffy, _ = ref_modules
    d, heads, lam, n, depth = 32, 4, 12, 40, 2
    rho = 0.5
    torch.manual_seed(4)
    ref_model = ref_snuffy.MILNet(
        ref_snuffy.FCLayer(d, 1),
        ref_snuffy.BClassifier(
            ref_snuffy.Encoder(
                ref_snuffy.EncoderLayer(
                    d,
                    copy.deepcopy(ref_snuffy.MultiHeadedAttention(heads, d)),
                    copy.deepcopy(
                        ref_snuffy.PositionwiseFeedForward(d, d * 2, "relu", 0.0)
                    ),
                    0.0, lam, rho,
                ),
                depth,
            ),
            1, d,
        ),
    ).eval()

    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=1, num_heads=heads, big_lambda=lam,
        random_patch_share=rho, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth, use_pallas=False,
    )
    params = snuffy_ref_to_flax(ref_model.state_dict(), depth)
    rng = np.random.default_rng(7)
    bag = rng.normal(size=(n, d)).astype(np.float32)

    model = MILNet(cfg)
    (ins, bag_logits, _), inter = model.apply(
        {"params": params}, jnp.asarray(bag), jnp.ones((n,), bool), True,
        rngs={"sparse": jax.random.PRNGKey(11)},
        mutable=["intermediates"],
    )
    enc = inter["intermediates"]["b_classifier"]["encoder"]
    k_top = cfg.k_top
    my_rand_per_layer = [
        np.asarray(enc[f"layer_{i}"]["sel_indices"][0])[k_top:]
        for i in range(depth)
    ]

    calls = {"i": 0}

    def choice_proxy(remaining, size, replace=False):
        picks = my_rand_per_layer[calls["i"]]
        calls["i"] += 1
        assert len(picks) == size
        assert set(picks.tolist()) <= set(remaining)
        return picks.astype(np.int64)

    proxy_np = types.SimpleNamespace(
        random=types.SimpleNamespace(choice=choice_proxy)
    )
    saved_np = ref_snuffy.np
    ref_snuffy.np = proxy_np
    try:
        with torch.no_grad():
            ref_ins, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])
    finally:
        ref_snuffy.np = saved_np
    assert calls["i"] == depth

    np.testing.assert_allclose(
        np.asarray(bag_logits), _t2n(ref_bag).reshape(-1),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ins), _t2n(ref_ins).reshape(n, 1), rtol=2e-3, atol=2e-4
    )


@pytest.fixture(scope="module")
def ref_dino_adapter_vit():
    import importlib.util
    import types

    stub = types.ModuleType("utils")
    stub.trunc_normal_ = torch.nn.init.trunc_normal_
    sys.modules["utils"] = stub
    sys.path.insert(0, os.path.join(REF, "dino_adapter"))
    spec = importlib.util.spec_from_file_location(
        "vits_dino_adapter",
        os.path.join(REF, "dino_adapter", "vision_transformer_with_adapter.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    sys.path.remove(os.path.join(REF, "dino_adapter"))


def test_dino_adapter_vit_parity(ref_dino_adapter_vit):
    """Adapter-ViT parity with ACTIVE adapters: LoRA init zeroes up_proj, so
    randomize the adapter weights first — this checks the adapter's exact
    placement (parallel branch fed by the post-attention sequence)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.vit import VisionTransformer

    va = ref_dino_adapter_vit
    torch.manual_seed(3)
    ref_model = va.vit_tiny(
        patch_size=16, adapter_ffn_layernorm_option="none",
        adapter_ffn_init_option="lora", adapter_ffn_scalar=4.0,
        adapter_ffn_num=8, adapter_d_model=192,
    ).eval()
    with torch.no_grad():
        for blk in ref_model.blocks:
            blk.adaptmlp.up_proj.weight.normal_(0, 0.05)
            blk.adaptmlp.up_proj.bias.normal_(0, 0.01)

    x = np.random.default_rng(2).normal(size=(2, 224, 224, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = VisionTransformer(
        patch_size=16, embed_dim=192, depth=12, num_heads=3, output="cls",
        use_adapter=True, adapter_bottleneck=8, adapter_scale=4.0,
        adapter_layernorm_option="none",
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    imported = ti.import_vit(sd)
    out = model.apply({"params": imported}, jnp.asarray(x), True)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().numpy(), rtol=2e-3, atol=2e-4
    )


def test_snuffy_multiclass_parity(ref_modules):
    """Multiclass parity: per-class top-k union + ref_dim rule are
    deterministic; the random share is aligned by proxying the reference's
    np.random.choice with my realized Gumbel picks."""
    import copy
    import types

    import importlib

    import jax
    import jax.numpy as jnp

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import MILNet

    sys.path.insert(0, REF)
    try:
        ref_mc = importlib.import_module("snuffy_multiclass")
    finally:
        sys.path.remove(REF)

    d, heads, lam, n, c, depth = 32, 4, 8, 30, 3, 2
    rho = 0.5
    torch.manual_seed(6)
    ref_model = ref_mc.MILNet(
        ref_mc.FCLayer(d, c),
        ref_mc.BClassifier(
            ref_mc.Encoder(
                ref_mc.EncoderLayer(
                    d,
                    copy.deepcopy(ref_mc.MultiHeadedAttention(heads, d)),
                    copy.deepcopy(
                        ref_mc.PositionwiseFeedForward(d, d * 2, "relu")
                    ),
                    c, 0.0, lam, rho,
                ),
                depth,
            ),
            c, d,
        ),
    ).eval()

    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=c, num_heads=heads, big_lambda=lam,
        random_patch_share=rho, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth, multiclass=True, use_pallas=False,
    )
    params = snuffy_ref_to_flax(ref_model.state_dict(), depth)
    rng = np.random.default_rng(9)
    bag = rng.normal(size=(n, d)).astype(np.float32)

    model = MILNet(cfg)
    (ins, bag_logits, _), inter = model.apply(
        {"params": params}, jnp.asarray(bag), jnp.ones((n,), bool), True,
        rngs={"sparse": jax.random.PRNGKey(13)},
        mutable=["intermediates"],
    )
    enc = inter["intermediates"]["b_classifier"]["encoder"]
    s_half = min(cfg.k_top * c, n)
    rand_picks = []
    for i in range(depth):
        idx = np.asarray(enc[f"layer_{i}"]["sel_indices"][0])
        val = np.asarray(enc[f"layer_{i}"]["sel_valid"][0])
        rand_picks.append(idx[s_half:][val[s_half:]])

    calls = {"i": 0}

    def choice_proxy(remaining, size, replace=False):
        picks = rand_picks[calls["i"]]
        calls["i"] += 1
        assert len(picks) == size, (len(picks), size)
        assert set(picks.tolist()) <= set(remaining)
        return picks.astype(np.int64)

    proxy_np = types.SimpleNamespace(
        inf=float("inf"),
        random=types.SimpleNamespace(choice=choice_proxy),
    )
    saved_np = ref_mc.np
    ref_mc.np = proxy_np
    try:
        with torch.no_grad():
            ref_ins, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])
    finally:
        ref_mc.np = saved_np
    assert calls["i"] == depth

    np.testing.assert_allclose(
        np.asarray(bag_logits), _t2n(ref_bag).reshape(-1),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ins), _t2n(ref_ins).reshape(n, c), rtol=2e-3, atol=2e-4
    )


def test_ece_parity_with_reference_metrics():
    """eval.metrics.ece_loss vs the reference's ECELoss on identical
    scores/labels (binary sigmoid scores, the train.py:415-451 call shape)."""
    import importlib

    from snuffy_tpu.eval.metrics import ece_loss

    sys.path.insert(0, REF)
    try:
        ref_metrics = importlib.import_module("metrics")
    finally:
        sys.path.remove(REF)

    rng = np.random.default_rng(0)
    n = 200
    labels = rng.integers(0, 2, (n, 1)).astype(float)
    # semi-calibrated scores
    scores = np.clip(
        labels[:, 0] * 0.6 + rng.random(n) * 0.5, 0.0, 1.0
    ).reshape(n, 1)

    ref = ref_metrics.ECELoss().loss(scores, labels, 0.5, n_bins=10,
                                     logits=False)
    mine = ece_loss(scores, labels, 0.5, n_bins=10, logits=False)
    np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-8)

    # logits mode too
    logits = rng.standard_normal((n, 3))
    labels3 = np.eye(3)[rng.integers(0, 3, n)]
    ref = ref_metrics.ECELoss().loss(logits, labels3, 0.5, n_bins=15,
                                     logits=True)
    mine = ece_loss(logits, labels3, 0.5, n_bins=15, logits=True)
    np.testing.assert_allclose(mine, ref, rtol=1e-6, atol=1e-8)


def test_froc_math_parity_with_reference():
    """compute_probabilities / compute_froc / compute_score vs the reference
    froc.py (its ASAP/skimage imports stubbed; these functions don't touch
    them at call time)."""
    import importlib.util
    import types

    for name in ("multiresolutionimageinterface", "skimage",
                 "skimage.measure"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].measure = sys.modules["skimage.measure"]
    mpl = types.ModuleType("matplotlib.pyplot")
    sys.modules.setdefault("matplotlib.pyplot", mpl)

    # our root froc.py shares the module name — load the reference file
    # under a unique name instead of import_module("froc")
    spec = importlib.util.spec_from_file_location(
        "ref_froc_module", os.path.join(REF, "froc.py")
    )
    ref_froc = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(ref_froc)
    finally:
        sys.path.remove(REF)

    from snuffy_tpu.eval import froc as mine

    rng = np.random.default_rng(0)
    # synthetic evaluation mask with 3 regions, one ITC
    ev = np.zeros((80, 80), int)
    ev[5:25, 5:25] = 1
    ev[40:70, 40:60] = 2
    ev[70, 10] = 3
    itcs = {3}
    dets = [(float(p), int(r), int(c))
            for p, r, c in zip(rng.random(40),
                               rng.integers(0, 80, 40),
                               rng.integers(0, 80, 40))]

    fp_r, tp_r, n_r = ref_froc.compute_probabilities(dets, ev, itcs)
    fp_m, tp_m, n_m = mine.compute_probabilities(dets, ev, itcs)
    assert fp_r == fp_m and tp_r == tp_m and n_r == n_m

    froc_data = {
        "a": {"fp": fp_r, "tp": tp_r, "count": n_r},
        "b": {"fp": [0.4, 0.2], "tp": [0.9], "count": 1},
    }
    avg_r, sens_r, th_r = ref_froc.compute_froc(froc_data)
    avg_m, sens_m, th_m = mine.compute_froc(froc_data)
    np.testing.assert_allclose(avg_m, avg_r)
    np.testing.assert_allclose(sens_m, sens_r)
    assert th_m == th_r
    assert mine.compute_score(avg_m, sens_m) == pytest.approx(
        ref_froc.compute_score(avg_r, sens_r)
    )


@pytest.fixture(scope="module")
def ref_dino_head():
    """Reference DINOHead (dino_adapter/vision_transformer_with_adapter.py)
    with its `utils`/`adapter` imports stubbed (they pull yaml/wandb)."""
    import importlib.util
    import types

    stub_utils = types.ModuleType("utils")
    stub_utils.trunc_normal_ = torch.nn.init.trunc_normal_
    stub_adapter = types.ModuleType("adapter")
    stub_adapter.Adapter = type("Adapter", (), {})
    saved = {k: sys.modules.get(k) for k in ("utils", "adapter")}
    sys.modules["utils"] = stub_utils
    sys.modules["adapter"] = stub_adapter
    spec = importlib.util.spec_from_file_location(
        "vits_dino_adapter_head",
        os.path.join(REF, "dino_adapter", "vision_transformer_with_adapter.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    for k, v in saved.items():
        if v is not None:
            sys.modules[k] = v
        else:
            sys.modules.pop(k, None)


def test_dino_head_weight_norm_import_parity(ref_dino_head, tmp_path):
    """Round-trip: reference DINOHead weights (weight_g/weight_v) through a
    reference-format full checkpoint → flax DINOHead; forward outputs match
    (reference main_dino_adapter.py:239-311 load semantics)."""
    import jax.numpy as jnp

    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.vit import DINOHead

    torch.manual_seed(3)
    in_dim, out_dim, hid, bot = 24, 40, 32, 16
    ref_head = ref_dino_head.DINOHead(
        in_dim, out_dim, norm_last_layer=False, hidden_dim=hid,
        bottleneck_dim=bot,
    )
    ckpt = {
        "student": {f"module.head.{k}": v
                    for k, v in ref_head.state_dict().items()},
        "teacher": {f"head.{k}": v for k, v in ref_head.state_dict().items()},
        "epoch": 3,
    }
    path = tmp_path / "full_ckpt.pth"
    torch.save(ckpt, path)

    import jax

    head = DINOHead(out_dim=out_dim, hidden_dim=hid, bottleneck_dim=bot,
                    norm_last_layer=False)
    template = head.init(jax.random.PRNGKey(0), jnp.zeros((1, in_dim)))[
        "params"]

    parts = ti.load_torch_full_checkpoint(str(path))
    loaded = ti.import_dino_student_teacher(
        parts, {"head": template}, {"head": template}
    )

    x = np.random.default_rng(0).standard_normal((5, in_dim)).astype(
        np.float32)
    ref_out = ref_head(torch.from_numpy(x)).detach().numpy()
    for part in ("student", "teacher"):
        out = head.apply({"params": loaded[part]["head"]}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref_out,
                                   rtol=1e-4, atol=1e-5)

    # Shape filtering: a larger out_dim model must keep its init head.
    big = DINOHead(out_dim=out_dim * 2, hidden_dim=hid, bottleneck_dim=bot,
                   norm_last_layer=False)
    big_t = big.init(jax.random.PRNGKey(1), jnp.zeros((1, in_dim)))["params"]
    loaded_big = ti.import_dino_student_teacher(
        parts, {"head": big_t}, {"head": big_t}
    )
    np.testing.assert_array_equal(
        np.asarray(loaded_big["student"]["head"]["last_layer_v"]),
        np.asarray(big_t["last_layer_v"]),
    )
    # mlp_0 shapes agree (in_dim × hid) so that one IS imported.
    np.testing.assert_allclose(
        np.asarray(loaded_big["student"]["head"]["mlp_0"]["kernel"]),
        ref_head.state_dict()["mlp.0.weight"].numpy().T,
    )

    # random_head drops everything.
    loaded_rand = ti.import_dino_student_teacher(
        parts, {"head": template}, {"head": template}, random_head=True
    )
    np.testing.assert_array_equal(
        np.asarray(loaded_rand["student"]["head"]["mlp_0"]["kernel"]),
        np.asarray(template["mlp_0"]["kernel"]),
    )


def test_milnet_export_roundtrip_to_reference(ref_modules):
    """Two-way interop: OUR trained MILNet exports to the reference's
    .pth layout, the reference loads it with strict=True (full key
    coverage), and both frameworks produce the same outputs — a user can
    train here and keep serving in the PyTorch reference (its load path,
    reference train.py:620-641 / roi.py:297-315)."""
    import copy

    import jax

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.embed.torch_export import export_milnet
    from snuffy_tpu.models.snuffy import MILNet

    ref_snuffy, _ = ref_modules
    d, heads, lam, n, depth = 32, 4, 10, 40, 2
    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=1, num_heads=heads, big_lambda=lam,
        random_patch_share=0.0, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth, use_pallas=False,
    )
    model = MILNet(cfg)
    rng = np.random.default_rng(0)
    bag = rng.normal(size=(n, d)).astype(np.float32)
    mask = np.ones((n,), bool)
    import jax.numpy as jnp

    jbag, jmask = jnp.asarray(bag), jnp.asarray(mask)
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "sparse": jax.random.PRNGKey(4)},
        jbag, jmask, True,
    )
    params = variables["params"]
    ins, bag_logits, _ = model.apply(
        {"params": params}, jbag, jmask, True,
        rngs={"sparse": jax.random.PRNGKey(0)},
    )

    sd = export_milnet(params)
    torch.manual_seed(0)
    attn = ref_snuffy.MultiHeadedAttention(heads, d)
    ff = ref_snuffy.PositionwiseFeedForward(d, d * 2, "relu", 0.0)
    ref_model = ref_snuffy.MILNet(
        ref_snuffy.FCLayer(in_size=d, out_size=1),
        ref_snuffy.BClassifier(
            ref_snuffy.Encoder(
                ref_snuffy.EncoderLayer(
                    d, copy.deepcopy(attn), copy.deepcopy(ff), 0.0, lam, 0.0
                ),
                depth,
            ),
            1, d,
        ),
    ).eval()
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected

    with torch.no_grad():
        ref_ins, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])
    np.testing.assert_allclose(
        np.asarray(ins), ref_ins.numpy()[0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bag_logits), ref_bag.numpy()[0], rtol=1e-4, atol=1e-5
    )


def test_milnet_export_roundtrip_multiclass(ref_modules):
    """The export also strict-loads into the reference's MULTICLASS
    MILNet (same module tree, C>1 head shapes) and reproduces outputs."""
    import copy

    import jax
    import jax.numpy as jnp

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.embed.torch_export import export_milnet
    from snuffy_tpu.models.snuffy import MILNet

    import importlib

    sys.path.insert(0, REF)
    try:
        ref_mc = importlib.import_module("snuffy_multiclass")
    finally:
        sys.path.remove(REF)
    d, heads, lam, n, depth, C = 32, 4, 10, 40, 2, 3
    cfg = SnuffyModelConfig(
        feats_size=d, num_classes=C, num_heads=heads, big_lambda=lam,
        random_patch_share=0.0, mlp_multiplier=2, encoder_dropout=0.0,
        attention_dropout=0.0, depth=depth, multiclass=True,
        use_pallas=False,
    )
    model = MILNet(cfg)
    rng = np.random.default_rng(1)
    bag = rng.normal(size=(n, d)).astype(np.float32)
    jbag, jmask = jnp.asarray(bag), jnp.ones((n,), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(5), "sparse": jax.random.PRNGKey(6)},
        jbag, jmask, True,
    )["params"]
    ins, bag_logits, _ = model.apply(
        {"params": params}, jbag, jmask, True,
        rngs={"sparse": jax.random.PRNGKey(0)},
    )

    sd = export_milnet(params)
    torch.manual_seed(0)
    attn = ref_mc.MultiHeadedAttention(heads, d)
    ff = ref_mc.PositionwiseFeedForward(d, d * 2, "relu")
    ref_model = ref_mc.MILNet(
        ref_mc.FCLayer(in_size=d, out_size=C),
        ref_mc.BClassifier(
            ref_mc.Encoder(
                ref_mc.EncoderLayer(
                    d, copy.deepcopy(attn), copy.deepcopy(ff), C, 0.0,
                    lam, 0.0
                ),
                depth,
            ),
            C, d,
        ),
    ).eval()
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    with torch.no_grad():
        ref_ins, ref_bag, _ = ref_model(torch.from_numpy(bag)[None])
    np.testing.assert_allclose(
        np.asarray(ins), ref_ins.numpy()[0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bag_logits), ref_bag.numpy()[0], rtol=1e-4, atol=1e-5
    )
