"""Embedder stack: ResNet/ViT/MAE forwards, torch-checkpoint import, and the
JPEG-bag → CSV extraction pipeline round-tripping into the MIL loader."""

import os

import numpy as np
import pytest

pytest.importorskip("PIL")


def test_resnet18_instance_norm_forward():
    import jax
    import jax.numpy as jnp
    from snuffy_tpu.models.resnet import ResNet18

    model = ResNet18(norm="instance")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 512)
    assert np.isfinite(np.asarray(out)).all()
    # InstanceNorm has no learned parameters → params only hold convs.
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.ndim in (4,) for l in leaves)  # conv kernels only


def _torch_vit_state_dict(depth=2, dim=64, heads=2, patch=16, img=224,
                          adapter=True, bottleneck=8):
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    n = (img // patch) ** 2
    sd = {
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, n + 1, dim),
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "norm.weight": torch.ones(dim),
        "norm.bias": torch.zeros(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": torch.ones(dim),
            f"{p}.norm1.bias": torch.zeros(dim),
            f"{p}.attn.qkv.weight": t(dim * 3, dim),
            f"{p}.attn.qkv.bias": t(dim * 3),
            f"{p}.attn.proj.weight": t(dim, dim),
            f"{p}.attn.proj.bias": t(dim),
            f"{p}.norm2.weight": torch.ones(dim),
            f"{p}.norm2.bias": torch.zeros(dim),
            f"{p}.mlp.fc1.weight": t(dim * 4, dim),
            f"{p}.mlp.fc1.bias": t(dim * 4),
            f"{p}.mlp.fc2.weight": t(dim, dim * 4),
            f"{p}.mlp.fc2.bias": t(dim),
        })
        if adapter:
            sd.update({
                f"{p}.adaptmlp.down_proj.weight": t(bottleneck, dim),
                f"{p}.adaptmlp.down_proj.bias": t(bottleneck),
                f"{p}.adaptmlp.up_proj.weight": t(dim, bottleneck),
                f"{p}.adaptmlp.up_proj.bias": t(dim),
            })
    return sd


def test_vit_checkpoint_import_complete(tmp_path):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from snuffy_tpu.embed import torch_import as ti
    from snuffy_tpu.models.vit import VisionTransformer

    sd = _torch_vit_state_dict()
    path = tmp_path / "vit.pth"
    torch.save(sd, str(path))

    model = VisionTransformer(
        patch_size=16, embed_dim=64, depth=2, num_heads=2,
        use_adapter=True, adapter_bottleneck=8, output="cls",
    )
    x = jnp.zeros((1, 224, 224, 3))
    template = model.init(jax.random.PRNGKey(0), x)["params"]

    loaded = ti.load_torch_state_dict(str(path))
    imported = ti.import_vit(loaded)
    matched, mismatched = ti.check_layers(imported, template)
    assert mismatched == [], f"missing: {mismatched}"

    merged = ti.merge_into(template, imported)
    out = model.apply({"params": merged}, x)
    assert out.shape == (1, 64)
    assert np.isfinite(np.asarray(out)).all()

    # Linear transpose sanity: torch (out,in) → flax (in,out)
    np.testing.assert_allclose(
        merged["blocks_0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].numpy().T,
    )


def test_positional_rezip_and_errors():
    from snuffy_tpu.embed.torch_import import positional_rezip

    sd = {"foreign.a": np.zeros((2, 3)), "foreign.b": np.ones((4,))}
    template = {"mine.x": np.empty((2, 3)), "mine.y": np.empty((4,))}
    out = positional_rezip(sd, template)
    assert set(out) == {"mine.x", "mine.y"}
    with pytest.raises(ValueError):
        positional_rezip({"a": np.zeros((5,))}, template)


def _make_fake_dataset(root, n_bags=2, patches_per_bag=3, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    tile_rows = []
    for cls in ("0_normal", "1_tumor"):
        for b in range(n_bags):
            slide = f"slide_{cls}_{b}"
            bag_dir = os.path.join(root, "single", "fold1", "train", cls, slide)
            os.makedirs(bag_dir, exist_ok=True)
            for p in range(patches_per_bag):
                arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                name = f"{p}_{p + 1}.jpeg"
                Image.fromarray(arr).save(os.path.join(bag_dir, name))
                tile_rows.append((f"{slide}_{p}_{p + 1}", int(cls[0])))
    import pandas as pd

    pd.DataFrame(tile_rows).to_csv(
        os.path.join(root, "tile_label.csv"), header=False, index=False
    )


def test_extraction_pipeline_roundtrip(tmp_path):
    from snuffy_tpu.embed.pipeline import extract_dataset, write_dataset_csv
    from snuffy_tpu.embed.registry import build_embedder
    from snuffy_tpu.data.bags import load_bag_csv

    dataset_path = str(tmp_path / "camelyon16")
    _make_fake_dataset(dataset_path)

    embedder = build_embedder(
        embedder="SimCLR", backbone="resnet18", num_classes=1, img_size=32
    )
    out_dir = str(tmp_path / "embeddings" / "camelyon16" / "SimCLR")
    rows = extract_dataset(
        embedder, dataset_path, "fold1", out_dir,
        class_labels={"0_normal": 0, "1_tumor": 1},
        tile_label_csv=os.path.join(dataset_path, "tile_label.csv"),
        batch_size=4, img_size=32,
    )
    assert len(rows) == 4
    labels = sorted(lab for _, lab in rows)
    assert labels == [0, 0, 1, 1]

    # Round-trip one bag CSV through the MIL loader schema.
    path, lab = rows[-1]
    label, feats, feats_labels, positions = load_bag_csv(path, lab, 1)
    assert feats.shape == (3, 512)
    assert feats_labels is not None and set(feats_labels) <= {0, 1}
    assert all("_" in p for p in positions)
    write_dataset_csv(str(tmp_path / "ds.csv"), rows)


def test_mae_embed_shape():
    import jax
    import jax.numpy as jnp
    from snuffy_tpu.models.mae import MaskedAutoencoderViT

    model = MaskedAutoencoderViT(
        img_size=32, patch_size=16, embed_dim=48, depth=1, num_heads=2,
        decoder_embed_dim=24, decoder_depth=1, decoder_num_heads=2,
        use_adapter=True, adapter_bottleneck=4,
    )
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        imgs, 0.5, True,
    )
    loss, pred, mask = model.apply(
        variables, imgs, 0.5, True, rngs={"masking": jax.random.PRNGKey(2)}
    )
    assert pred.shape == (2, 4, 16 * 16 * 3)
    assert mask.shape == (2, 4)
    # mask ratio 0.5 of 4 patches → exactly 2 masked per sample
    np.testing.assert_array_equal(np.asarray(mask).sum(axis=1), [2, 2])
    assert np.isfinite(float(loss))

    emb = model.apply(
        variables, imgs, method=MaskedAutoencoderViT.embed_tokens
    )
    assert emb.shape == (2, 48)


def test_compute_feats_to_train_handoff(tmp_path, monkeypatch):
    """The L4→L5 artifact contract: compute_feats output feeds train.py's
    split-by-folder loader (fold dir stripped; 'valid' prefix matches the
    'validation' folder like the reference's startswith filter)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from PIL import Image

    from snuffy_tpu.embed.pipeline import extract_dataset, write_dataset_csv
    from snuffy_tpu.embed.registry import build_embedder

    rng = np.random.default_rng(0)
    dataset_path = tmp_path / "datasets" / "camelyon16"
    for split in ("train", "validation", "test"):
        for cls in ("0_normal", "1_tumor"):
            for b in range(2):
                d = dataset_path / "single" / "fold1" / split / cls / \
                    f"{cls[2:]}_{split}_{b}"
                d.mkdir(parents=True)
                for p in range(2):
                    arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
                    Image.fromarray(arr).save(str(d / f"{p}_{p}.jpeg"))

    embedder = build_embedder(embedder="SimCLR", backbone="resnet18",
                              num_classes=1, img_size=32)
    out_dir = tmp_path / "embeddings" / "camelyon16" / "SimCLR"
    rows = extract_dataset(
        embedder, str(dataset_path), "fold1", str(out_dir),
        class_labels={"0_normal": 0, "1_tumor": 1},
        batch_size=4, img_size=32,
    )
    write_dataset_csv(str(out_dir / "camelyon16.csv"), rows)
    # fold dir stripped from output paths
    assert (out_dir / "train" / "0_normal").is_dir()
    assert not (out_dir / "fold1").exists()

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    cfg = train_cli.build_config(train_cli.get_args_parser().parse_args([
        "--dataset=camelyon16", "--embedding=SimCLR", "--feats_size=512",
        "--use_mp=0",
    ]))
    train_d, valid_d, test_d = train_cli.load_datasets(cfg)
    assert len(train_d[0]) == 4
    assert len(valid_d[0]) == 4   # 'valid' prefix matches 'validation'
    assert len(test_d[0]) == 4
    assert train_d[1][0].shape[1] == 512


def test_native_csv_parser_matches_pandas(tmp_path):
    from snuffy_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    import pandas as pd

    rng = np.random.default_rng(7)
    arr = (rng.standard_normal((200, 64)) * 10).astype(np.float32)
    path = str(tmp_path / "bag.csv")
    pd.DataFrame(arr, columns=[str(i) for i in range(64)]).to_csv(
        path, index=False, float_format="%.6f"
    )
    fast = native.parse_bag_csv_fast(path)
    ref = pd.read_csv(path).to_numpy(np.float32)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-6)


def test_embedder_bf16_close_to_f32_all_families():
    """compute_dtype='bfloat16' must be honored by EVERY registry branch
    (SimCLR/ResNet18 and MAE were silently f32 before) and track the f32
    embeddings within bf16 tolerance (params and outputs stay f32)."""
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.embed.registry import build_embedder

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 224, 224, 3)), jnp.float32)

    cases = [
        dict(embedder="SimCLR", backbone="resnet18", num_classes=1,
             patch_size=16, use_adapter=False, adapter_ffn_num=8,
             adapter_ffn_scalar=4.0),
        dict(embedder="MAE", backbone="mae_vit_base_patch16", num_classes=1,
             patch_size=16, use_adapter=True, adapter_ffn_num=8,
             adapter_ffn_scalar=4.0),
        dict(embedder="DINO", backbone="vit_small", num_classes=1,
             patch_size=16, use_adapter=True, adapter_ffn_num=8,
             adapter_ffn_scalar=4.0),
    ]
    for kw in cases:
        e32 = build_embedder(compute_dtype="float32", **kw)
        e16 = build_embedder(compute_dtype="bfloat16", **kw)
        e16.params = e32.params  # same weights, different compute dtype
        f32 = np.asarray(e32.backbone_apply(e32.params, img))
        f16 = np.asarray(e16.backbone_apply(e16.params, img))
        assert f16.dtype == np.float32, kw["embedder"]
        cos = (f32 * f16).sum() / (
            np.linalg.norm(f32) * np.linalg.norm(f16) + 1e-9
        )
        assert cos > 0.99, (kw["embedder"], cos)


def test_save_class_features_artifact_tree(tmp_path):
    """Reference compute_feats.py:548-587: one [bag_path,label] CSV per
    (split, class), class ids from the global sorted class list, plus the
    shuffled dataset CSV; --droped non-zero writes nothing."""
    import pandas as pd

    from snuffy_tpu.embed.pipeline import save_class_features

    out = tmp_path / "emb"
    for split in ("train", "test"):
        for cls in ("0_normal", "1_tumor"):
            d = out / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                (d / f"slide_{i}.csv").write_text("0\n1\n")

    all_df = save_class_features(str(out), "camelyon16.csv", droped=0)
    assert all_df is not None and len(all_df) == 12
    for split in ("train", "test"):
        for cls, num in (("0_normal", 0), ("1_tumor", 1)):
            df = pd.read_csv(out / split / f"{cls}.csv")
            assert len(df) == 3
            assert (df["label"] == num).all()
            assert all(str(p).endswith(".csv") for p in df.iloc[:, 0])
    ds = pd.read_csv(out / "camelyon16.csv")
    assert len(ds) == 12 and set(ds["label"]) == {0, 1}
    # shuffled: not grouped by label
    assert list(ds["label"]) != sorted(list(ds["label"]))

    # droped gate: nothing is (re)written
    import os
    import shutil

    out2 = tmp_path / "emb2"
    shutil.copytree(out / "train", out2 / "train")
    assert save_class_features(str(out2), "x.csv", droped=1) is None
    assert not (out2 / "x.csv").exists()


def test_dp_sharded_extraction_matches_single_device(tmp_path):
    """compute_bag_feats with the batch dp-sharded over the 8-device mesh
    returns the SAME features as plain single-placement extraction (the
    multi-chip scale-out path of extract_dataset)."""
    import os

    import numpy as np
    from PIL import Image

    from snuffy_tpu.embed.pipeline import compute_bag_feats
    from snuffy_tpu.embed.registry import build_embedder
    from snuffy_tpu.parallel.ssl_sharding import dp_mesh

    rng = np.random.default_rng(3)
    bag = tmp_path / "bag"
    os.makedirs(bag)
    paths = []
    for p in range(11):  # odd count: forces tail padding + shard rounding
        arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        f = str(bag / f"{p}_{p}.jpeg")
        Image.fromarray(arr).save(f)
        paths.append(f)

    emb = build_embedder(embedder="SimCLR", backbone="resnet18",
                         num_classes=1, img_size=32)
    fn = emb.jit_apply()
    plain = compute_bag_feats(fn, emb.params, emb.head_params, paths,
                              batch_size=4, img_size=32)
    sharded = compute_bag_feats(fn, emb.params, emb.head_params, paths,
                                batch_size=4, img_size=32,
                                mesh=dp_mesh(8))
    assert plain.shape == sharded.shape == (11, 512)
    np.testing.assert_allclose(plain, sharded, rtol=2e-5, atol=2e-5)
