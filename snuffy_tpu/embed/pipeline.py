"""Batched patch feature extraction: JPEG bags → per-bag CSV embeddings.

Rebuild of the reference extraction loop (reference compute_feats.py:66-266):
  * bag = one directory of patch JPEGs named `{col}_{row}[-{level}].jpeg`
    (tiler contract, SURVEY.md §2.10);
  * patch labels looked up in the dataset-level tile_label.csv dict
    (compute_feats.py:533-545);
  * images resized to 224 and scaled to [0,1]; ImageNet normalization iff
    `transform` (compute_feats.py:104-197);
  * one fixed-size jitted batch forward per step — the tail batch is padded
    so every bag runs the same XLA program (no recompiles per bag size);
  * per-bag CSV `[0..D−1, label, position]` + dataset CSV `[path, label]`
    (compute_feats.py:256-266, 548-587) — byte-compatible with the MIL
    trainer's loader.

Host-side decode parallelism comes from a process pool (the DataLoader
worker equivalent); the device only ever sees dense (B, 224, 224, 3)
batches.
"""

from __future__ import annotations

import csv
import glob
import multiprocessing as mp
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_POSITION_RE = re.compile(r"(\d+)_(\d+)(?:-(\d+))?\.jpe?g$", re.IGNORECASE)


def parse_position(filename: str) -> Optional[str]:
    """`{col}_{row}[-{level}].jpeg` → 'col_row' (reference
    compute_feats.py:89-97)."""
    m = _POSITION_RE.search(os.path.basename(filename))
    if not m:
        return None
    return f"{m.group(1)}_{m.group(2)}"


def load_patch_labels(tile_label_csv: str) -> Dict[str, int]:
    """slide/position → patch label dict (reference compute_feats.py:533-545).
    Keys are '{slide}_{col}_{row}'."""
    labels: Dict[str, int] = {}
    df = pd.read_csv(tile_label_csv, header=None)
    for _, row in df.iterrows():
        key, lab = str(row.iloc[0]), int(row.iloc[1])
        if key in labels and labels[key] != lab:
            raise ValueError(f"duplicate conflicting patch label for {key}")
        labels[key] = lab
    return labels


def _decode_one(args):
    path, size = args
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def decode_batch(paths: Sequence[str], size: int, pool: Optional[mp.Pool]):
    jobs = [(p, size) for p in paths]
    if pool is not None:
        imgs = pool.map(_decode_one, jobs)
    else:
        imgs = [_decode_one(j) for j in jobs]
    return np.stack(imgs)


def normalize_batch(batch: np.ndarray, imagenet: bool) -> np.ndarray:
    """Host-side normalization fallback; the jitted embedders normalize on
    device (Embedder.jit_apply), so batches normally stay uint8."""
    if imagenet:
        return (batch.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return batch


def list_bags(dataset_path: str, fold: str) -> List[str]:
    """`<dataset>/single/<fold>/**/bag_dir` — every dir containing JPEGs."""
    root = os.path.join(dataset_path, "single", fold)
    bags = set()
    for ext in ("*.jpg", "*.jpeg"):
        for jpg in glob.glob(os.path.join(root, "**", ext), recursive=True):
            bags.add(os.path.dirname(jpg))
    return sorted(bags)


def compute_bag_feats(
    embed_fn,
    backbone_params,
    head_params,
    patch_paths: Sequence[str],
    batch_size: int = 128,
    img_size: int = 224,
    imagenet_norm: bool = False,
    pool: Optional[mp.Pool] = None,
    mesh=None,
) -> np.ndarray:
    """All patches of one bag → (N, D) feats. The tail batch is zero-padded
    so every dispatch uses one static (batch_size, ...) shape.

    With `mesh` (a dp Mesh over the local chips) each batch shards its rows
    across the dp axis — one program embeds batch_size/dp patches per chip
    (data-parallel extraction; the reference is single-GPU here,
    compute_feats.py:200-266)."""
    import jax.numpy as jnp

    if mesh is not None:
        from snuffy_tpu.parallel.ssl_sharding import shard_batch_global

        dp = mesh.devices.size
        if batch_size % dp:
            batch_size += dp - batch_size % dp  # keep shards equal

    feats_out = []
    n = len(patch_paths)
    for start in range(0, n, batch_size):
        chunk = patch_paths[start:start + batch_size]
        # uint8 to the device; the jitted embedder casts + normalizes there
        # (4x smaller host->device transfers).
        batch = decode_batch(chunk, img_size, pool)
        if len(chunk) < batch_size:
            pad = np.zeros(
                (batch_size - len(chunk),) + batch.shape[1:], batch.dtype
            )
            batch = np.concatenate([batch, pad])
        batch = (shard_batch_global(batch, mesh) if mesh is not None
                 else jnp.asarray(batch))
        feats, _ = embed_fn(backbone_params, head_params, batch)
        feats_out.append(np.asarray(feats)[: len(chunk)])
    return np.concatenate(feats_out) if feats_out else np.zeros((0, 0))


def write_bag_csv(
    out_csv: str,
    feats: np.ndarray,
    positions: Optional[List[str]] = None,
    labels: Optional[List[int]] = None,
):
    """Per-bag CSV with the loader's schema (reference compute_feats.py:256-266
    ↔ utils.py:138-183)."""
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    df = pd.DataFrame(feats, columns=[str(i) for i in range(feats.shape[1])])
    if labels is not None and positions is not None:
        df["label"] = labels
        df["position"] = positions
    df.to_csv(out_csv, index=False)


def write_dataset_csv(out_csv: str, rows: List[Tuple[str, int]]):
    """Dataset-level `[path, label]` CSV (reference compute_feats.py:548-587)."""
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    pd.DataFrame(rows, columns=["0", "1"]).to_csv(out_csv, index=False)


def save_class_features(out_dir: str, dataset_csv_name: str,
                        droped: int = 0, seed: int = 0):
    """The reference's full artifact tree (compute_feats.py:548-587):

      * one `[bag_path, label]` CSV per (split, class) at
        `<out_dir>/<split>/<class>.csv`, class numbers from the globally
        sorted class-name list;
      * the SHUFFLED dataset-level CSV at `<out_dir>/<dataset>.csv`
        (the reference shuffles with sklearn.utils.shuffle; here the
        shuffle is seeded so extraction runs are reproducible);
      * `droped != 0` writes NOTHING — the reference gates the whole
        function on `args.droped == 0`.

    Returns the shuffled dataset DataFrame, or None when gated off / no
    split/class layout exists under out_dir."""
    if droped != 0:
        return None
    split_class_dirs = sorted(
        glob.glob(os.path.join(out_dir, "*", "*" + os.sep))
    )
    split_class_dirs = [d for d in split_class_dirs if os.path.isdir(d)]
    if not split_class_dirs:
        return None
    classes = sorted(
        {d.rstrip(os.sep).split(os.sep)[-1] for d in split_class_dirs}
    )
    dfs = []
    for d in split_class_dirs:
        bag_csvs = sorted(glob.glob(os.path.join(d, "*.csv")))
        split_name, class_name = d.rstrip(os.sep).split(os.sep)[-2:]
        df = pd.DataFrame(bag_csvs)
        df["label"] = classes.index(class_name)
        df.to_csv(os.path.join(out_dir, split_name, class_name + ".csv"),
                  index=False)
        dfs.append(df)
    all_df = pd.concat(dfs, axis=0, ignore_index=True)
    all_df = all_df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    all_df.to_csv(os.path.join(out_dir, dataset_csv_name), index=False)
    return all_df


def extract_dataset(
    embedder,
    dataset_path: str,
    fold: str,
    out_dir: str,
    class_labels: Optional[Dict[str, int]] = None,
    tile_label_csv: Optional[str] = None,
    batch_size: int = 128,
    img_size: int = 224,
    imagenet_norm: bool = False,
    num_workers: int = 0,
    use_mesh: Optional[bool] = None,
) -> List[Tuple[str, int]]:
    """Full extraction: every bag under `<dataset>/single/<fold>` → one CSV
    under out_dir, plus the dataset CSV. Returns the dataset rows.

    Scale-out: with >1 local device the patch batches dp-shard across the
    chips (`use_mesh=None` auto-enables; force with True/False); with >1
    process (multi-host), hosts take disjoint bags by stride — extraction
    is embarrassingly parallel across bags and each bag writes its own CSV.
    """
    import jax

    embed_fn = embedder.jit_apply(imagenet_norm=imagenet_norm)
    if use_mesh is None:
        use_mesh = jax.local_device_count() > 1
    mesh = None
    if use_mesh and jax.local_device_count() > 1:
        from snuffy_tpu.parallel.ssl_sharding import dp_mesh

        mesh = dp_mesh(local=True)
    patch_labels = load_patch_labels(tile_label_csv) if tile_label_csv else None
    pool = mp.Pool(num_workers) if num_workers > 0 else None
    rows: List[Tuple[str, int]] = []
    bag_dirs = list_bags(dataset_path, fold)
    if jax.process_count() > 1:
        bag_dirs = bag_dirs[jax.process_index()::jax.process_count()]
    try:
        for bag_dir in bag_dirs:
            patch_paths = sorted(
                glob.glob(os.path.join(bag_dir, "*.jpg"))
                + glob.glob(os.path.join(bag_dir, "*.jpeg"))
            )
            if not patch_paths:
                continue
            feats = compute_bag_feats(
                embed_fn, embedder.params, embedder.head_params, patch_paths,
                batch_size, img_size, imagenet_norm, pool, mesh=mesh,
            )
            slide = os.path.basename(bag_dir)
            # Output layout strips the fold dir: <out_dir>/<split>/<class>/
            # <slide>.csv (reference compute_feats.py:262-266) — train.py's
            # split-by-folder prefix filter depends on this exact shape.
            rel = os.path.relpath(
                bag_dir, os.path.join(dataset_path, "single", fold)
            )
            out_csv = os.path.join(out_dir, rel + ".csv")
            positions = [parse_position(p) or "" for p in patch_paths]
            labels = None
            if patch_labels is not None:
                labels = [
                    patch_labels.get(f"{slide}_{pos}", 0) for pos in positions
                ]
            write_bag_csv(out_csv, feats, positions,
                          labels if labels is not None else None)
            cls = 0
            if class_labels:
                cls_dir = os.path.basename(os.path.dirname(bag_dir))
                cls = class_labels.get(cls_dir, 0)
            rows.append((out_csv, cls))
    finally:
        if pool is not None:
            pool.close()
            pool.join()
    return rows
