"""Bag-of-embeddings IO: the filesystem contract shared with the reference.

Artifact layout (reference utils.py:138-211):
  - dataset CSV: rows = [path_to_bag_feats_csv, label]
  - per-bag CSV: columns = feat_0..feat_{D−1} [+ 'label' + 'position']

Loading shuffles patch rows within each bag (reference utils.py:158) and
builds one-hot labels for multiclass. A process pool parallelizes CSV
parsing exactly like the reference's `mp.Pool` path (utils.py:221-234); the
optional C++ fast parser (snuffy_tpu.native) accelerates the per-file parse
when built.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


@dataclass
class BagData:
    """One loaded split. Mirrors the reference's positional tuple
    (labels, feats, feats_labels, positions, slide_names)."""

    labels: List[np.ndarray]           # each (C,)
    feats: List[np.ndarray]            # each (N_i, D) float32
    feats_labels: Optional[List[np.ndarray]]  # each (N_i,) or None
    positions: Optional[List[List[str]]]
    slide_names: List[str]

    def __len__(self):
        return len(self.labels)


def _one_hot_label(raw_label, num_classes: int) -> np.ndarray:
    label = np.zeros(num_classes, dtype=np.float32)
    if num_classes == 1:
        label[0] = float(raw_label)
    else:
        idx = int(raw_label)
        if idx <= num_classes - 1:
            label[idx] = 1.0
    return label


def _read_header(path: str) -> List[str]:
    with open(path) as f:
        return f.readline().strip().split(",")


def load_bag_csv(
    feats_csv_path: str,
    raw_label,
    num_classes: int,
    shuffle_rows: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[List[str]]]:
    """Read one bag CSV → (label (C,), feats (N, D), feats_labels, positions).

    Feature-only CSVs go through the native single-pass float parser when
    built (snuffy_tpu.native) — ~5-10× faster than pandas on wide bags;
    CSVs with label/position columns use pandas (mixed dtypes).
    """
    header = _read_header(feats_csv_path)
    has_patch_labels = "position" in header and "label" in header

    if not has_patch_labels:
        from snuffy_tpu import native

        fast = native.parse_bag_csv_fast(feats_csv_path)
        if fast is not None:
            feats = fast
            if shuffle_rows:
                rng = rng or np.random.default_rng()
                feats = feats[rng.permutation(len(feats))]
            return _one_hot_label(raw_label, num_classes), feats, None, None

    df = pd.read_csv(feats_csv_path)
    if shuffle_rows:
        rng = rng or np.random.default_rng()
        df = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    if has_patch_labels:
        feats = df.drop(columns=["label", "position"]).to_numpy(np.float32)
        feats_labels = df["label"].to_numpy()
        positions = list(df["position"])
    else:
        feats = df.to_numpy(np.float32)
        feats_labels, positions = None, None
    label = _one_hot_label(raw_label, num_classes)
    return label, feats, feats_labels, positions


def _load_one(args):
    path, raw_label, num_classes, seed = args
    rng = np.random.default_rng(seed)
    label, feats, feats_labels, positions = load_bag_csv(
        path, raw_label, num_classes, rng=rng
    )
    slide_name = os.path.basename(path).rsplit(".", 1)[0]
    return label, feats, feats_labels, positions, slide_name


def load_split(
    bags_df: pd.DataFrame,
    num_classes: int,
    num_processes: int = 8,
    use_mp: bool = True,
    seed: Optional[int] = None,
) -> BagData:
    """Load every bag in a split dataframe ([path, label] rows)."""
    ss = np.random.SeedSequence(seed)
    seeds = ss.generate_state(len(bags_df))
    jobs = [
        (bags_df.iloc[i, 0], bags_df.iloc[i, 1], num_classes, int(seeds[i]))
        for i in range(len(bags_df))
    ]
    if use_mp and len(jobs) > 1:
        with mp.Pool(processes=num_processes) as pool:
            results = pool.map(_load_one, jobs)
    else:
        results = [_load_one(j) for j in jobs]

    labels, feats, feats_labels, positions, names = map(list, zip(*results))
    if any(fl is None for fl in feats_labels):
        feats_labels, positions = None, None
    return BagData(labels, feats, feats_labels, positions, names)


def split_dataframe_by_folder(
    bags_df: pd.DataFrame, path_prefix: str
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Train/valid/test by path prefix (reference train.py:586-593)."""
    col = bags_df.columns[0]
    return tuple(
        bags_df[bags_df[col].str.startswith(f"{path_prefix}/{name}")]
        for name in ("train", "valid", "test")
    )


def split_dataframe_by_ratio(
    bags_df: pd.DataFrame, split: float
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Ratio split for official feats (reference train.py:595-602)."""
    n_train = int(len(bags_df) * (1 - split))
    train_df = bags_df.iloc[:n_train]
    rest = bags_df.iloc[n_train:]
    half = len(rest) // 2
    return train_df, rest.iloc[:half], rest.iloc[half:]


def l2_normalize_rows(feats: np.ndarray) -> np.ndarray:
    """Per-patch L2 norm (reference train.py:251-252)."""
    return feats / np.linalg.norm(feats, axis=1, keepdims=True)


def dropout_patches(
    feats: np.ndarray, p: float, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Drop-and-repad patch augmentation (reference utils.py:244-250):
    keep a (1−p) sample, then append p·N rows re-sampled from the keepers
    so the bag size is preserved."""
    if p <= 0:
        return feats
    rng = rng or np.random.default_rng()
    n = feats.shape[0]
    keep = rng.choice(np.arange(n), int(n * (1 - p)), replace=False)
    sampled = feats[keep]
    pad = rng.choice(np.arange(sampled.shape[0]), int(n * p), replace=False)
    return np.concatenate([sampled, sampled[pad]], axis=0)
