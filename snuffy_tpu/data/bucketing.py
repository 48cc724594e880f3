"""Ragged-bag → static-shape bucketing for XLA.

Each bag (N, D) is padded to the smallest bucket length strictly greater
than N (strict, so at least one padding row always exists — dead selection
slots scatter out-of-bounds safely) and paired with a validity mask. One
XLA program is compiled per (bucket, D) pair; bucket growth is geometric so
the compile count stays O(log N_max) while padding waste stays bounded.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# Near-geometric buckets with ratio ≤4/3 ({16,20,24}·2^k): padding waste is
# bounded at 33% (mean ~12%) instead of the 100% worst case of pure
# powers of two, at ~1.5× the compile count. Every bucket is a multiple of
# 8·2^k so large buckets stay MXU-tile friendly (10240 = 40·256 catches the
# ~10k-patch Camelyon16 mode with 2.4% waste). WSI bags are 1k-12k patches,
# MUSK bags are <100 instances.
DEFAULT_BUCKETS = tuple(
    sorted(m * 2**i for m in (16, 20, 24) for i in range(12))
)  # 16 .. 49152


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    """Smallest bucket strictly greater than n (≥1 guaranteed pad row)."""
    for b in buckets:
        if b > n:
            return b
    raise ValueError(f"bag of {n} patches exceeds largest bucket {buckets[-1]}")


def pad_bag(
    feats: np.ndarray, buckets: Sequence[int] = DEFAULT_BUCKETS
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (N, D) to (bucket, D) and return (padded, mask)."""
    n, d = feats.shape
    b = bucket_length(n, buckets)
    padded = np.zeros((b, d), dtype=feats.dtype)
    padded[:n] = feats
    mask = np.zeros(b, dtype=bool)
    mask[:n] = True
    return padded, mask
