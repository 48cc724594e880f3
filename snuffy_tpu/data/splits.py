"""Dataset management: split/fold/n-shot reorganization of tiled datasets.

Covers the reference's datasets/ scripts (SURVEY.md §2.11):
  * CAMELYON16 official split (test_* slides) + 80/20 train/val of the rest
    (reference datasets/camelyon16/train_validation_test_splitter_camelyon.py)
    and its reverse;
  * TCGA patient-aware 4-fold KFold → folds/fold_{i}.csv
    (reference datasets/tcga/fold_generator.py:11-22) and the fold-applying
    splitter;
  * n-shot patch subsets (≤N patches per slide,
    reference datasets/camelyon16/n_shot_dataset_maker.py).

All functions are pure path reorganizations (shutil move/copy) and return
manifests so they are testable without real data.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

SPLIT_NAMES = ("train", "validation", "test")


def camelyon16_split_slides(
    reference_csv: str, val_size: float = 0.2, seed: int = 42
) -> Dict[str, List[str]]:
    """Official CAMELYON16 split: test_* slides are the test set; the
    normal_*/tumor_* slides split 80/20 into train/validation."""
    from sklearn.model_selection import train_test_split

    df = pd.read_csv(reference_csv)
    names = df["image"].str.replace(r"\.tiff?$", "", regex=True)
    is_test = names.str.startswith("test")
    train_val = names[~is_test].tolist()
    test = names[is_test].tolist()
    train, val = train_test_split(train_val, test_size=val_size,
                                  random_state=seed)
    return {"train": list(train), "validation": list(val), "test": test}


def apply_split(
    base_dir: str,
    split: Dict[str, List[str]],
    classes: Sequence[str] = ("0_normal", "1_tumor"),
    fold: int = 1,
) -> pd.DataFrame:
    """Move single/<class>/<slide> → single/fold{n}/<split>/<class>/<slide>
    and write fold{n}/fold{n}.csv. Returns the manifest."""
    fold_dir = os.path.join(base_dir, f"fold{fold}")
    rows = []
    for split_name, slides in split.items():
        for cls in classes:
            for slide in slides:
                src = os.path.join(base_dir, cls, slide)
                if not os.path.exists(src):
                    continue
                dst = os.path.join(fold_dir, split_name, cls, slide)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                rows.append(
                    {"name": slide, "split": split_name, "label": cls[0]}
                )
    df = pd.DataFrame(rows)
    os.makedirs(fold_dir, exist_ok=True)
    df.to_csv(os.path.join(fold_dir, f"fold{fold}.csv"), index=False)
    return df


def reverse_split(
    base_dir: str,
    classes: Sequence[str] = ("0_normal", "1_tumor"),
    fold: int = 1,
) -> int:
    """Undo apply_split: move slides back to single/<class>/ (reference
    train_validation_test_reverse_camelyon.py). Returns slides moved."""
    fold_dir = os.path.join(base_dir, f"fold{fold}")
    moved = 0
    for split_name in SPLIT_NAMES:
        for cls in classes:
            cls_dir = os.path.join(fold_dir, split_name, cls)
            if not os.path.isdir(cls_dir):
                continue
            for slide in os.listdir(cls_dir):
                src = os.path.join(cls_dir, slide)
                dst = os.path.join(base_dir, cls, slide)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                moved += 1
    return moved


def tcga_patient_folds(
    patient_csv: str,
    out_dir: str,
    n_splits: int = 4,
    val_size: float = 0.2,
    seed: int = 42,
) -> List[str]:
    """Patient-aware k-fold: KFold over unique patients, 80/20 train/val of
    each fold's train patients, slides resolved per patient (reference
    datasets/tcga/fold_generator.py:11-42). Writes fold_{i}.csv files with
    columns train/validation/test."""
    from sklearn.model_selection import KFold, train_test_split

    patients_df = pd.read_csv(patient_csv)
    unique_patients = np.unique(patients_df["patient"].values)
    kf = KFold(n_splits=n_splits, random_state=seed, shuffle=True)

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, (train_index, test_index) in enumerate(kf.split(unique_patients)):
        train_index, val_index = train_test_split(
            train_index, test_size=val_size, random_state=seed
        )
        split_slides = {}
        for name, idx in (("train", train_index), ("validation", val_index),
                          ("test", test_index)):
            pats = unique_patients[idx]
            split_slides[name] = patients_df.slide[
                patients_df.patient.isin(pats)
            ].values
        fold_df = pd.concat(
            [
                pd.DataFrame({name: split_slides[name]}).reset_index(drop=True)
                for name in SPLIT_NAMES
            ],
            axis=1,
        )
        path = os.path.join(out_dir, f"fold_{i}.csv")
        fold_df.to_csv(path, index=False)
        paths.append(path)
    return paths


def split_from_fold_csv(fold_csv: str) -> Dict[str, List[str]]:
    df = pd.read_csv(fold_csv)
    return {
        name: df[name].dropna().astype(str).tolist()
        for name in SPLIT_NAMES
        if name in df.columns
    }


def n_shot_subset(
    src_dir: str,
    dst_dir: str,
    num_files: int = 5,
    seed: Optional[int] = None,
    copy: bool = True,
) -> int:
    """Sample ≤num_files patches per slide into a parallel tree (reference
    n_shot_dataset_maker.py). Returns total patches copied."""
    rng = np.random.default_rng(seed)
    total = 0
    for cls in sorted(os.listdir(src_dir)):
        cls_dir = os.path.join(src_dir, cls)
        if not os.path.isdir(cls_dir):
            continue
        for slide in sorted(os.listdir(cls_dir)):
            slide_dir = os.path.join(cls_dir, slide)
            if not os.path.isdir(slide_dir):
                continue
            out = os.path.join(dst_dir, cls, slide)
            os.makedirs(out, exist_ok=True)
            patches = sorted(
                f for f in os.listdir(slide_dir)
                if f.endswith((".jpeg", ".jpg"))
            )
            pick = rng.choice(
                len(patches), min(num_files, len(patches)), replace=False
            )
            for i in pick:
                op = shutil.copy if copy else shutil.move
                op(os.path.join(slide_dir, patches[i]),
                   os.path.join(out, patches[i]))
                total += 1
    return total
