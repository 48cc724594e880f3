"""Host-side image streaming for SSL pretraining.

Replaces torchvision ImageFolder + DataLoader + DistributedSampler
(reference mae_adapter/main_pretrain_adapter.py:154-193): the host only
decodes JPEGs into uint8 batches (process pool); every augmentation runs on
device (ssl/augment.py). Sharding over the dp axis replaces the
DistributedSampler: each epoch's permutation is global and the batch is
device_put with a dp NamedSharding.
"""

from __future__ import annotations

import glob
import multiprocessing as mp
import os
from typing import Iterator, List, Tuple

import numpy as np


def list_image_folder(root: str) -> Tuple[List[str], List[int]]:
    """ImageFolder contract: root/<class>/*.jpeg → (paths, class indices)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    paths, labels = [], []
    for i, c in enumerate(classes):
        for ext in ("*.jpg", "*.jpeg", "*.png"):
            for p in sorted(glob.glob(os.path.join(root, c, "**", ext),
                                      recursive=True)):
                paths.append(p)
                labels.append(i)
    return paths, labels


def _decode(args):
    path, size = args
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


class ImageBatcher:
    """Shuffled fixed-size uint8 batches; short epochs drop the tail like
    DataLoader(drop_last=True)."""

    def __init__(self, paths: List[str], batch_size: int, img_size: int,
                 num_workers: int = 0, seed: int = 0):
        self.paths = paths
        self.batch_size = batch_size
        self.img_size = img_size
        self.rng = np.random.default_rng(seed)
        self.pool = mp.Pool(num_workers) if num_workers > 0 else None

    def __len__(self):
        return len(self.paths) // self.batch_size

    def epoch(self) -> Iterator[np.ndarray]:
        order = self.rng.permutation(len(self.paths))
        for start in range(0, len(self.paths) - self.batch_size + 1,
                           self.batch_size):
            chunk = [self.paths[i] for i in order[start:start + self.batch_size]]
            jobs = [(p, self.img_size) for p in chunk]
            imgs = (self.pool.map(_decode, jobs) if self.pool
                    else [_decode(j) for j in jobs])
            yield np.stack(imgs)

    def close(self):
        if self.pool is not None:
            self.pool.close()
            self.pool.join()
