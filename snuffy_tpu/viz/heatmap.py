"""Attention/score heatmaps over whole slides.

Rebuild of the reference visualization paths (reference roi.py:230-294
`blend_and_visualize` and utils.py:297-310 `visualize_attentions`): patch
scores are scattered into a (rows, cols) grid by their tile positions,
min-max rescaled, colormapped, resized to a slide thumbnail, and blended
over the grayscale WSI with an optional tumor-mask contour.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np

_POS_RE = re.compile(r"[^\d]*(\d+)[^\d]*(\d+)")


def parse_positions(position_strings: Sequence[str]) -> List[Tuple[int, int]]:
    """'col_row' strings → [(col, row)] (reference train.py:312-320 regex)."""
    out = []
    for s in position_strings:
        m = _POS_RE.search(str(s))
        out.append((int(m.group(1)), int(m.group(2))) if m else (0, 0))
    return out


def scores_to_grid(
    positions: Sequence[Tuple[int, int]],
    scores: np.ndarray,
    grid_shape: Optional[Tuple[int, int]] = None,
    return_occupancy: bool = False,
):
    """Scatter per-patch scores into a (rows, cols) float grid. Scores are
    min-max rescaled over the occupied cells (reference roi.py:246-258
    rescales instance logits to a color map). Empty cells hold 0, which is
    NOT a score — pass `return_occupancy=True` to also get the (rows, cols)
    bool occupancy mask (the reference overlays only occupied tiles)."""
    scores = np.asarray(scores, np.float64).reshape(-1)
    if grid_shape is None:
        rows = max(r for _, r in positions) + 1
        cols = max(c for c, _ in positions) + 1
    else:
        rows, cols = grid_shape
    grid = np.zeros((rows, cols), np.float64)
    occ = np.zeros((rows, cols), bool)
    lo, hi = scores.min(), scores.max()
    scaled = (scores - lo) / (hi - lo) if hi > lo else np.zeros_like(scores)
    for (col, row), v in zip(positions, scaled):
        if 0 <= row < rows and 0 <= col < cols:
            grid[row, col] = v
            occ[row, col] = True
    if return_occupancy:
        return grid, occ
    return grid


def mask_contour(mask: np.ndarray) -> np.ndarray:
    """Binary mask → 1-px contour (the reference's FIND_EDGES + MaxFilter,
    roi.py:268-275)."""
    import cv2

    m = (mask > 0).astype(np.uint8)
    edges = cv2.morphologyEx(m, cv2.MORPH_GRADIENT, np.ones((3, 3), np.uint8))
    return cv2.dilate(edges, np.ones((3, 3), np.uint8)) > 0


def blend_heatmap(
    slide_gray: np.ndarray,        # (H, W) uint8 grayscale thumbnail
    grid: np.ndarray,              # (rows, cols) scores in [0, 1]
    contour: Optional[np.ndarray] = None,   # (H, W) bool
    alpha: float = 0.5,
    colormap: str = "jet",
    occupancy: Optional[np.ndarray] = None,  # (rows, cols) bool
) -> np.ndarray:
    """Colormapped score grid resized onto the thumbnail → RGB uint8.

    Cells without any patch (background / filtered tiles) stay the bare
    grayscale slide instead of being painted as score-0 "cold" — the
    reference overlays only occupied tiles (roi.py:246-258)."""
    import cv2
    import matplotlib

    matplotlib.use("Agg")

    h, w = slide_gray.shape[:2]
    heat = cv2.resize(grid.astype(np.float32), (w, h),
                      interpolation=cv2.INTER_NEAREST)
    rgba = matplotlib.colormaps[colormap](heat)
    heat_rgb = (rgba[..., :3] * 255).astype(np.uint8)
    base = np.stack([slide_gray] * 3, axis=-1).astype(np.float32)
    out = (1 - alpha) * base + alpha * heat_rgb.astype(np.float32)
    if occupancy is not None:
        occ_px = cv2.resize(occupancy.astype(np.uint8), (w, h),
                            interpolation=cv2.INTER_NEAREST).astype(bool)
        out = np.where(occ_px[..., None], out, base)
    out = out.astype(np.uint8)
    if contour is not None:
        out[contour] = (0, 255, 0)
    return out


def visualize_attentions(
    scores: np.ndarray,
    position_strings: Sequence[str],
    out_path: str,
    slide_gray: Optional[np.ndarray] = None,
    tumor_mask: Optional[np.ndarray] = None,
):
    """Save a heatmap PNG for one bag (reference utils.py:297-310 /
    roi.py:230-294). Without a thumbnail, the raw grid is saved."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    positions = parse_positions(position_strings)
    grid, occ = scores_to_grid(positions, scores, return_occupancy=True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if slide_gray is not None:
        contour = mask_contour(tumor_mask) if tumor_mask is not None else None
        img = blend_heatmap(slide_gray, grid, contour, occupancy=occ)
        plt.imsave(out_path, img)
    else:
        plt.imsave(out_path, grid, cmap="jet")
    return grid
