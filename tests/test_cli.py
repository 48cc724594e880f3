"""The `train.py` CLI end-to-end on a synthetic MUSK-format dataset —
the reference's own smoke path (reference README.md:685-696): SVM file →
admissible-shuffle pickle → cross-validated MIL training."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_synthetic_svm(path, num_bags=24, d=166, rng=None):
    """`ID:BagID:ClassID f:v ...` rows; positives carry a shifted direction."""
    rng = rng or np.random.default_rng(0)
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    lines = ["header"]
    iid = 0
    for b in range(num_bags):
        y = b % 2
        n = int(rng.integers(4, 12))
        for i in range(n):
            vec = rng.standard_normal(d) * 0.5
            if y and i < max(2, n // 3):
                vec += 2.5 * direction
            feats = " ".join(f"{j + 1}:{vec[j]:.5f}" for j in range(d))
            lines.append(f"{iid}:{b}:{y} {feats}")
            iid += 1
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_train_cli_musk1(tmp_path, monkeypatch):
    from snuffy_tpu.data.mil_pickle import build_mil_pickle

    base = tmp_path / "datasets" / "mil_dataset"
    write_synthetic_svm(str(base / "Musk" / "musk1norm.svm"))
    build_mil_pickle("musk1", num_folds=4, valid_ratio=0.25,
                     datasets_base_path=str(base),
                     rng=np.random.default_rng(1))

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    # Patch the MIL data path to the tmp dataset dir.
    orig = train_cli.load_datasets

    def load(cfg):
        from snuffy_tpu.data.mil_pickle import load_mil_data

        return load_mil_data(
            cfg.dataset, cfg.model.feats_size, cfg.cv_num_folds,
            cfg.cv_current_fold, cfg.cv_valid_ratio,
            mil_datasets_base_path=str(base),
        )

    monkeypatch.setattr(train_cli, "load_datasets", load)

    summary = train_cli.main([
        "--dataset=musk1", "--arch=snuffy", "--num_heads=2",
        "--big_lambda=8", "--random_patch_share=0.3",
        "--num_epochs=3", "--lr=1e-3", "--optimizer=adamw",
        "--cv_num_folds=4", "--cv_valid_ratio=0.25",
        "--soft_average=1", "--use_mp=0", "--use_pallas=0",
    ])
    assert summary["best_epoch"] >= 1
    assert "test_best" in summary
    # feats_size forced to 166 for musk1 (reference train.py:992-999)
    run_dir = os.path.join("runs", "musk1")
    assert os.path.isdir(run_dir) and len(os.listdir(run_dir)) == 1


def test_mil_pickle_roundtrip(tmp_path):
    from snuffy_tpu.data.mil_pickle import (
        build_mil_pickle,
        cross_validation_set,
        load_mil_data,
    )

    base = tmp_path / "mil"
    write_synthetic_svm(str(base / "Musk" / "musk1norm.svm"), num_bags=16)
    out = build_mil_pickle("musk1", num_folds=4, valid_ratio=0.25,
                           datasets_base_path=str(base),
                           rng=np.random.default_rng(2))
    assert out.endswith("musk1norm_4folds_0.25split.pkl")
    train, valid, test = load_mil_data(
        "musk1", 166, 4, 0, 0.25, mil_datasets_base_path=str(base)
    )
    # every split non-empty, features are (N,166), labels in {0,1}
    for split in (train, valid, test):
        labels, feats, _, _ = split
        assert len(labels) > 0
        assert all(f.shape[1] == 166 for f in feats)
        assert set(float(l[0]) for l in labels) <= {0.0, 1.0}


def test_train_cli_multiclass(tmp_path, monkeypatch):
    """snuffy_multiclass end-to-end through the CLI on 3-class synthetic
    embeddings (the TCGA-style path, reference README.md:683)."""
    import numpy as np

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    rng = np.random.default_rng(0)
    num_classes, d = 3, 32
    directions = rng.standard_normal((num_classes, d))

    def make(num_bags):
        labels, feats = [], []
        for i in range(num_bags):
            y = i % num_classes
            n = int(rng.integers(20, 40))
            x = rng.standard_normal((n, d)).astype(np.float32)
            x[: max(3, n // 4)] += 2.5 * directions[y]
            one_hot = np.zeros(num_classes, np.float32)
            one_hot[y] = 1.0
            labels.append(one_hot)
            feats.append(x)
        return labels, feats, None, None

    data = {"train": make(24), "valid": make(12), "test": make(12)}
    monkeypatch.setattr(
        train_cli, "load_datasets",
        lambda cfg: (data["train"], data["valid"], data["test"]),
    )
    summary = train_cli.main([
        "--dataset=camelyon16", "--arch=snuffy_multiclass",
        "--num_classes=3", "--feats_size=32", "--num_heads=2",
        "--big_lambda=8", "--random_patch_share=0.5", "--num_epochs=4",
        "--lr=2e-3", "--optimizer=adamw", "--use_mp=0", "--use_pallas=0",
    ])
    assert summary["best_epoch"] >= 1
    aucs = summary["test_best"]["epoch_test_best_aucs"]
    assert len(aucs) == 3


def test_train_cli_official_embeddings(tmp_path, monkeypatch):
    """'official' embedding path: ratio split of a dataset CSV of per-bag
    feature CSVs (reference train.py:572-602)."""
    import numpy as np
    import pandas as pd

    monkeypatch.chdir(tmp_path)
    import train as train_cli

    rng = np.random.default_rng(3)
    direction = rng.standard_normal(16)
    emb_dir = tmp_path / "embeddings" / "camelyon16" / "official"
    emb_dir.mkdir(parents=True)
    rows = []
    for i in range(20):
        y = i % 2
        n = int(rng.integers(10, 20))
        x = rng.standard_normal((n, 16)).astype(np.float32)
        if y:
            x[: n // 3] += 3.0 * direction / np.linalg.norm(direction)
        path = emb_dir / f"bag_{i}.csv"
        pd.DataFrame(x, columns=[str(j) for j in range(16)]).to_csv(
            path, index=False
        )
        rows.append((str(path), y))
    pd.DataFrame(rows, columns=["0", "1"]).to_csv(
        emb_dir / "Camelyon16.csv", index=False
    )

    summary = train_cli.main([
        "--dataset=camelyon16", "--embedding=official", "--arch=snuffy",
        "--feats_size=16", "--num_heads=2", "--big_lambda=8",
        "--num_epochs=3", "--lr=2e-3", "--optimizer=adamw",
        "--split=0.4", "--use_mp=0", "--use_pallas=0",
    ])
    assert summary["best_epoch"] >= 1
    assert "test_best" in summary


def test_export_torch_checkpoint_cli(tmp_path):
    """msgpack MIL checkpoint → reference .pth via the converter CLI:
    tensor count, shapes and the single_weight_parameter side file."""
    import jax
    import numpy as np
    from flax import serialization

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import export_torch_checkpoint as cli

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params

    cfg = SnuffyModelConfig(feats_size=16, num_classes=1, num_heads=2,
                            big_lambda=8, depth=2, use_pallas=False)
    params = init_milnet_params(cfg, seed=0, n_example=32)
    src = str(tmp_path / "5.msgpack")
    with open(src, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": params, "w": np.float32(0.25),
             "step": np.int32(10)}
        ))
    dst = str(tmp_path / "5.pth")
    cli.main([src, dst])

    import torch

    sd = torch.load(dst, weights_only=True)
    # 2 (i_cls) + depth*(8 attn + 4 ffn + 4 ln) + 2 (enc norm) + 2 (linear)
    assert len(sd) == 2 + 2 * 16 + 2 + 2
    assert sd["i_classifier.fc.0.weight"].shape == (1, 16)
    assert sd["b_classifier.encoder.layers.1.feed_forward.w_1.weight"
              ].shape == (64, 16)
    w = torch.load(str(tmp_path / "5_single_weight_parameter.pth"),
                   weights_only=True)
    assert abs(float(w) - 0.25) < 1e-6
