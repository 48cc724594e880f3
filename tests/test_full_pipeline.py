"""The complete five-stage pipeline on synthetic data, through the real
CLIs: tile → split → extract features → train MIL → ROI heatmap.
(The reference's pipeline contract, README.md:35-46 "each step can be
executed independently" — here each stage consumes exactly what the
previous stage wrote to disk.)"""

import glob
import json
import os

import numpy as np
import pytest

from snuffy_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_five_stage_pipeline(tmp_path, monkeypatch):
    from tests.test_tiling import make_slide, write_xml

    monkeypatch.chdir(tmp_path)

    # ---- stage 0: raw slides
    base = tmp_path / "datasets" / "camelyon16"
    (base / "0_normal").mkdir(parents=True)
    (base / "1_tumor").mkdir(parents=True)
    (base / "annotations").mkdir()
    rng = np.random.default_rng(0)
    slides = []
    for i in range(2):
        for cls, prefix in (("0_normal", "normal"), ("1_tumor", "tumor")):
            name = f"{prefix}_{i:03}"
            make_slide(str(base / cls / f"{name}.tif"))
            slides.append((cls, name))
    for i in range(2):
        write_xml(str(base / "annotations" / f"tumor_{i:03}.xml"),
                  [(256, 256), (700, 256), (700, 700), (256, 700)])

    # ---- stage 1: tiling CLI
    import deepzoom_tiler_camelyon16 as tiler_cli

    tiler_cli.main(["-j", "0", "-t", "5", "-o", "20", "-b", "20",
                    "--datasets_path", "datasets"])
    assert (base / "tile_label.csv").exists()

    # ---- stage 2: split into fold1 (official-style splitter API)
    from snuffy_tpu.data.splits import apply_split

    split = {
        "train": ["normal_000", "tumor_000"],
        "validation": ["normal_001", "tumor_001"],
        "test": ["normal_001", "tumor_001"],  # reuse for the tiny run
    }
    # test reuses validation slides: copy instead of double-move
    apply_split(str(base / "single"),
                {"train": split["train"], "validation": split["validation"]})
    # stage the test split as a copy of validation
    import shutil

    for cls in ("0_normal", "1_tumor"):
        src_root = base / "single" / "fold1" / "validation" / cls
        for slide in os.listdir(src_root):
            shutil.copytree(str(src_root / slide),
                            str(base / "single" / "fold1" / "test" / cls / slide))

    # ---- stage 3: feature extraction CLI
    import compute_feats as cf_cli

    cf_cli.main(["--embedder=SimCLR", "--backbone=resnet18",
                 "--batch_size=4", "--num_workers=0",
                 "--dataset=camelyon16", "--fold=fold1"])
    emb_dir = tmp_path / "embeddings" / "camelyon16" / "SimCLR"
    assert (emb_dir / "camelyon16.csv").exists()
    assert (emb_dir / "embedder.msgpack").exists()

    # ---- stage 4: MIL training CLI
    import train as train_cli

    summary = train_cli.main([
        "--dataset=camelyon16", "--embedding=SimCLR", "--feats_size=512",
        "--num_heads=2", "--big_lambda=4", "--num_epochs=2", "--lr=1e-3",
        "--optimizer=adamw", "--use_mp=0", "--use_pallas=0",
        "--wandb_run=e2e",
    ])
    assert summary["best_epoch"] >= 1
    run_dir = tmp_path / "runs" / "camelyon16" / "e2e"
    ckpts = sorted(glob.glob(str(run_dir / "*.msgpack")))
    assert ckpts

    # ---- stage 5: ROI heatmaps CLI
    import roi as roi_cli

    bags = roi_cli.main([
        "--embedder", "SimCLR", "--backbone", "resnet18",
        "--aggregator_weights", ckpts[0],
        "--num_heads", "2", "--big_lambda", "4", "--depth", "1",
        "--feats_size", "512", "--batch_size", "4",
        "--bags_path",
        str(base / "single" / "fold1" / "test" / "1_tumor" / "*"),
        "--slides_path", str(base / "1_tumor"),
        "--output", str(tmp_path / "roi_output"),
    ])
    assert len(bags) == 1  # one tumor slide in the test split
    pngs = os.listdir(str(tmp_path / "roi_output"))
    assert len(pngs) == 1 and all(p.endswith(".png") for p in pngs)


def test_tcga_multiclass_pipeline(tmp_path, monkeypatch):
    """The TCGA-Lung multiclass path through the real file contracts:
    tile (no -level naming) → patient-aware folds → fold splitter →
    compute_feats → snuffy_multiclass training (reference README.md:683,
    deepzoom_tiler_tcga_lung_cancer.py, datasets/tcga/*)."""
    import pandas as pd

    from tests.test_tiling import make_slide

    monkeypatch.chdir(tmp_path)

    # ---- stage 0: raw slides, two classes, one slide per patient
    base = tmp_path / "datasets" / "tcga"
    slides = []
    for cls in ("0_luad", "1_lusc"):
        (base / cls).mkdir(parents=True)
        for i in range(3):
            name = f"TCGA-{cls[2:]}-{i:02}"
            make_slide(str(base / cls / f"{name}.tif"))
            slides.append(name)

    # ---- stage 1: TCGA tiler CLI (svs default overridden to tif)
    import deepzoom_tiler_tcga_lung_cancer as tiler_cli

    tiler_cli.main(["-j", "0", "-t", "5", "-o", "20", "-b", "20",
                    "--slide_format", "tif", "--datasets_path", "datasets"])
    tiles = os.listdir(str(base / "single" / "0_luad" / "TCGA-luad-00"))
    assert tiles and all(t.count("_") == 1 and "-" not in t for t in tiles), \
        "TCGA naming contract: {col}_{row}.jpeg, no level suffix"

    # ---- stage 2: patient folds + fold splitter
    from snuffy_tpu.data.splits import (apply_split, split_from_fold_csv,
                                        tcga_patient_folds)

    pd.DataFrame({"patient": slides, "slide": slides}).to_csv(
        str(base / "patients.csv"), index=False
    )
    fold_csvs = tcga_patient_folds(str(base / "patients.csv"),
                                   str(base / "folds"), n_splits=3)
    # contract: every fold csv parses into disjoint patient-level splits
    split = split_from_fold_csv(fold_csvs[0])
    assert set(split) == {"train", "validation", "test"}
    assert not (set(split["train"]) & set(split["test"]))
    # 6 patients can land single-class test splits; use a deterministic
    # class-balanced assignment for the downstream stages
    balanced = {
        "train": ["TCGA-luad-00", "TCGA-lusc-00"],
        "validation": ["TCGA-luad-01", "TCGA-lusc-01"],
        "test": ["TCGA-luad-02", "TCGA-lusc-02"],
    }
    apply_split(str(base / "single"), balanced,
                classes=("0_luad", "1_lusc"), fold=1)

    # ---- stage 3: feature extraction CLI
    import compute_feats as cf_cli

    cf_cli.main(["--embedder=SimCLR", "--backbone=resnet18",
                 "--batch_size=4", "--num_workers=0", "--num_classes=2",
                 "--dataset=tcga", "--fold=fold1"])
    emb_dir = tmp_path / "embeddings" / "tcga" / "SimCLR"
    assert (emb_dir / "tcga.csv").exists()

    # ---- stage 4: multiclass MIL training CLI from the extracted CSVs
    import train as train_cli

    summary = train_cli.main([
        "--dataset=tcga", "--embedding=SimCLR", "--feats_size=512",
        "--arch=snuffy_multiclass", "--num_classes=2", "--num_heads=2",
        "--big_lambda=4", "--random_patch_share=0.5", "--num_epochs=2",
        "--lr=1e-3", "--optimizer=adamw", "--use_mp=0", "--use_pallas=0",
        "--wandb_run=tcga_e2e",
    ])
    aucs = summary["test_best"]["epoch_test_best_aucs"]
    assert len(aucs) == 2  # one AUC per class through the real pipeline
