"""Dataset management: CAMELYON16 split/reverse, TCGA patient folds,
n-shot subsets."""

import os

import numpy as np
import pandas as pd
import pytest

from snuffy_tpu.data.splits import (
    apply_split,
    camelyon16_split_slides,
    n_shot_subset,
    reverse_split,
    split_from_fold_csv,
    tcga_patient_folds,
)


def _make_single_tree(base, classes, slides_per_class=4, patches=3):
    for ci, cls in enumerate(classes):
        for s in range(slides_per_class):
            prefix = "normal" if cls.startswith("0") else "tumor"
            d = os.path.join(base, cls, f"{prefix}_{s:03}")
            os.makedirs(d, exist_ok=True)
            for p in range(patches):
                open(os.path.join(d, f"{p}_{p}.jpeg"), "w").write("x")


def test_camelyon16_split_and_reverse(tmp_path):
    base = str(tmp_path / "single")
    _make_single_tree(base, ("0_normal", "1_tumor"))
    ref = pd.DataFrame({
        "image": [f"normal_{i:03}.tif" for i in range(4)]
        + [f"tumor_{i:03}.tif" for i in range(4)]
        + ["test_001.tif"],
        "type": ["normal"] * 4 + ["tumor"] * 4 + ["tumor"],
    })
    ref_csv = str(tmp_path / "reference.csv")
    ref.to_csv(ref_csv, index=False)
    # add the test slide dir too
    os.makedirs(os.path.join(base, "1_tumor", "test_001"), exist_ok=True)

    split = camelyon16_split_slides(ref_csv, val_size=0.25, seed=0)
    assert split["test"] == ["test_001"]
    assert len(split["train"]) == 6 and len(split["validation"]) == 2

    df = apply_split(base, split, fold=1)
    assert (tmp_path / "single" / "fold1" / "fold1.csv").exists()
    assert set(df["split"]) <= {"train", "validation", "test"}
    # originals moved away
    assert not os.listdir(os.path.join(base, "0_normal"))

    moved = reverse_split(base, fold=1)
    assert moved == len(df)
    assert len(os.listdir(os.path.join(base, "0_normal"))) == 4


def test_tcga_patient_folds_disjoint(tmp_path):
    rng = np.random.default_rng(0)
    patients = [f"P{i}" for i in range(12)]
    rows = [
        {"patient": p, "slide": f"{p}_slide{j}"}
        for p in patients for j in range(2)
    ]
    csv = str(tmp_path / "patients.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    paths = tcga_patient_folds(csv, str(tmp_path / "folds"), n_splits=4)
    assert len(paths) == 4
    for path in paths:
        split = split_from_fold_csv(path)
        # patient-aware: a patient's slides never straddle splits
        pat = lambda s: s.split("_")[0]
        train_p = {pat(s) for s in split["train"]}
        val_p = {pat(s) for s in split["validation"]}
        test_p = {pat(s) for s in split["test"]}
        assert not (train_p & test_p)
        assert not (train_p & val_p)
        assert not (val_p & test_p)


def test_n_shot_subset(tmp_path):
    src = str(tmp_path / "train")
    _make_single_tree(src, ("0_normal", "1_tumor"), slides_per_class=2,
                      patches=5)
    dst = str(tmp_path / "train_2shot")
    total = n_shot_subset(src, dst, num_files=2, seed=0)
    assert total == 2 * 2 * 2
    for cls in ("0_normal", "1_tumor"):
        for slide in os.listdir(os.path.join(dst, cls)):
            assert len(os.listdir(os.path.join(dst, cls, slide))) == 2
