"""Whole-slide tiling: pyramidal TIFF → per-bag patch JPEGs + labels.

Rebuild of the reference deepzoom tilers (reference
deepzoom_tiler_camelyon16.py / deepzoom_tiler_tcga_lung_cancer.py;
SURVEY.md §2.10), redesigned:

  * slide decode through the native libtiff reader (snuffy_tpu.native),
    the OpenSlide replacement; PIL fallback for plain images;
  * target magnification → pyramid level selection: read at the deepest
    TIFF level whose downsample ≤ objective/target, then box-downsample the
    residual factor (the DeepZoomGenerator arithmetic,
    deepzoom_tiler_camelyon16.py:219-224);
  * background filter: mean 8-neighbour edge energy > threshold (the PIL
    FIND_EDGES rule, deepzoom_tiler_camelyon16.py:81-85);
  * CAMELYON16 patch labels: annotation polygons are rasterized ONCE into
    a low-res tumor mask (cv2.fillPoly) and every patch queries its
    overlap — replaces per-patch shapely intersection
    (deepzoom_tiler_camelyon16.py:87-94,110-132) and kills the
    multi-process tile_label.csv append race (SURVEY.md §5): workers
    return labels, one writer writes;
  * process-pool tile workers, each with its own slide handle (the
    reference's JoinableQueue TileWorker processes).

Naming contracts preserved: `{col}_{row}-{level}.jpeg` (camelyon16) /
`{col}_{row}.jpeg` (tcga), `tile_label.csv` rows `{slide}_{col}_{row},label`.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

EDGE_KERNEL = np.array(
    [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype=np.float32
)


@dataclass
class TilerConfig:
    tile_size: int = 256
    quality: int = 75
    background_threshold: float = 15.0  # mean edge energy (camelyon16: 15, tcga: 20)
    objective_power: float = 40.0
    base_mag: float = 20.0
    workers: int = 4
    name_with_level: bool = True  # camelyon16 `{col}_{row}-{level}.jpeg`
    tumor_coverage: float = 0.0   # patch labeled tumor if overlap > this
    # DeepZoomGenerator-style tile overlap (reference
    # deepzoom_tiler_camelyon16.py:305 `-e/--overlap`): the grid still steps
    # by tile_size, but each tile gains `overlap` extra pixels on every side
    # that abuts another tile — interior tiles are (tile+2·overlap)².
    overlap: int = 0
    # 'jpeg' or 'png' (reference `-f/--format`).
    image_format: str = "jpeg"


def edge_energy(tile: np.ndarray) -> float:
    """Mean |8-neighbour Laplacian| over the grayscale tile (PIL FIND_EDGES
    equivalent, reference deepzoom_tiler_camelyon16.py:81-85)."""
    import cv2

    gray = cv2.cvtColor(tile, cv2.COLOR_RGB2GRAY).astype(np.float32)
    edges = cv2.filter2D(gray, -1, EDGE_KERNEL)
    return float(np.abs(edges).mean())


def parse_camelyon16_xml(xml_path: str) -> List[np.ndarray]:
    """ASAP-format annotation XML → list of (N, 2) level-0 (x, y) polygons
    (reference deepzoom_tiler_camelyon16.py:110-132)."""
    tree = ET.parse(xml_path)
    polygons = []
    for ann in tree.iter("Annotation"):
        coords = []
        for c in ann.iter("Coordinate"):
            coords.append((float(c.get("X")), float(c.get("Y"))))
        if len(coords) >= 3:
            polygons.append(np.asarray(coords, np.float64))
    return polygons


def rasterize_annotations(
    polygons: Sequence[np.ndarray], level0_size: Tuple[int, int],
    mask_downsample: float = 32.0,
) -> Tuple[np.ndarray, float]:
    """Rasterize level-0 polygons into a low-res uint8 tumor mask."""
    import cv2

    w0, h0 = level0_size
    mw, mh = int(np.ceil(w0 / mask_downsample)), int(np.ceil(h0 / mask_downsample))
    mask = np.zeros((mh, mw), np.uint8)
    pts = [
        np.round(poly / mask_downsample).astype(np.int32) for poly in polygons
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask, mask_downsample


def pick_read_level(slide, target_downsample: float) -> Tuple[int, float]:
    """Deepest stored level with downsample ≤ target; returns (level,
    residual factor to shrink by after reading)."""
    best, best_down = 0, 1.0
    for lvl in range(slide.level_count):
        d = slide.level_downsample(lvl)
        if d <= target_downsample + 1e-6 and d > best_down:
            best, best_down = lvl, d
    return best, target_downsample / best_down


def _grid(slide, level: int, residual: float, tile: int):
    lw, lh = slide.level_dimensions(level)
    read = int(round(tile * residual))
    cols = lw // read
    rows = lh // read
    return read, cols, rows


_worker_state: dict = {}


def _init_worker(slide_path, mask_info=None):
    from snuffy_tpu.native import NativeSlide

    _worker_state["slide"] = NativeSlide(slide_path)
    _worker_state["mask_info"] = mask_info


def _write_tile(path: str, region: np.ndarray, quality: int, fmt: str):
    if fmt == "jpeg":
        from snuffy_tpu.native import jpeg_write

        jpeg_write(path, region, quality)
    else:  # png (or anything PIL encodes)
        from PIL import Image

        Image.fromarray(region).save(path)


def _tile_one(args):
    (col, row, level, read, tile, out_path, threshold,
     name_with_level, quality, tumor_coverage, dz_level, overlap, fmt,
     cols, rows) = args
    mask_info = _worker_state.get("mask_info")
    import cv2

    slide = _worker_state["slide"]
    # Overlap extends the read window on every side that has a neighbour
    # (DeepZoomGenerator semantics); the scale between stored-level pixels
    # and output pixels is read/tile.
    scale = read / tile
    ov_l = int(round(overlap * scale)) if col > 0 else 0
    ov_t = int(round(overlap * scale)) if row > 0 else 0
    ov_r = int(round(overlap * scale)) if col < cols - 1 else 0
    ov_b = int(round(overlap * scale)) if row < rows - 1 else 0
    x0 = col * read - ov_l
    y0 = row * read - ov_t
    w = read + ov_l + ov_r
    h = read + ov_t + ov_b
    region = slide.read_region(level, x0, y0, w, h)
    out_w = tile + (overlap if col > 0 else 0) + (overlap if col < cols - 1 else 0)
    out_h = tile + (overlap if row > 0 else 0) + (overlap if row < rows - 1 else 0)
    if region.shape[:2] != (out_h, out_w):
        region = cv2.resize(region, (out_w, out_h),
                            interpolation=cv2.INTER_AREA)
    if edge_energy(region) <= threshold:
        return None  # background
    ext = "jpeg" if fmt == "jpeg" else fmt
    name = (f"{col}_{row}-{dz_level}.{ext}" if name_with_level
            else f"{col}_{row}.{ext}")
    _write_tile(os.path.join(out_path, name), region, quality, fmt)

    label = None
    if mask_info is not None:
        mask, mask_down, level_down = mask_info
        # patch rect in mask coords
        scale = level_down * read / mask_down
        x0 = int(col * scale)
        y0 = int(row * scale)
        x1 = max(x0 + 1, int((col + 1) * scale))
        y1 = max(y0 + 1, int((row + 1) * scale))
        patch_mask = mask[y0:min(y1, mask.shape[0]), x0:min(x1, mask.shape[1])]
        coverage = float(patch_mask.mean()) if patch_mask.size else 0.0
        label = 1 if coverage > tumor_coverage else 0
    return col, row, label


def tile_slide(
    slide_path: str,
    out_dir: str,
    cfg: TilerConfig,
    annotation_xml: Optional[str] = None,
    mag_level: int = 0,
) -> List[Tuple[int, int, Optional[int]]]:
    """Tile one slide into out_dir. Returns kept (col, row, label) tuples
    (label None when no annotations). `mag_level` counts halvings below
    base_mag (the reference's per-magnification deepzoom levels,
    deepzoom_tiler_camelyon16.py:152-159)."""
    from snuffy_tpu.native import NativeSlide

    os.makedirs(out_dir, exist_ok=True)
    slide = NativeSlide(slide_path)
    target_down = cfg.objective_power / cfg.base_mag * (2 ** mag_level)
    level, residual = pick_read_level(slide, target_down)
    read, cols, rows = _grid(slide, level, residual, cfg.tile_size)
    level_down = slide.level_downsample(level)
    # deepzoom level index of the target magnification (for file naming):
    # DeepZoomGenerator counts levels from max(w, h) at level 0 size 1 —
    # level_count = 1 + ceil(log2(max(w, h))), filename level =
    # level_count − 1 − log2(downsample) (reference
    # deepzoom_tiler_camelyon16.py:152,219-224).
    w0, h0 = slide.level_dimensions(0)
    dz_max = int(np.ceil(np.log2(max(w0, h0, 1))))
    dz_level = dz_max - int(round(np.log2(max(target_down, 1.0))))

    mask_info = None
    if annotation_xml is not None and os.path.exists(annotation_xml):
        polygons = parse_camelyon16_xml(annotation_xml)
        mask, mask_down = rasterize_annotations(
            polygons, slide.level_dimensions(0)
        )
        mask_info = (mask, mask_down, level_down)
    slide.close()

    # The rasterized annotation mask rides in the worker INITIALIZER, not
    # the per-tile job tuples — otherwise it is pickled once per tile,
    # O(tiles × mask_bytes) of IPC.
    jobs = [
        (c, r, level, read, cfg.tile_size, out_dir, cfg.background_threshold,
         cfg.name_with_level, cfg.quality, cfg.tumor_coverage, dz_level,
         cfg.overlap, cfg.image_format, cols, rows)
        for r in range(rows)
        for c in range(cols)
    ]
    if cfg.workers > 1:
        with mp.Pool(cfg.workers, initializer=_init_worker,
                     initargs=(slide_path, mask_info)) as pool:
            results = pool.map(_tile_one, jobs)
    else:
        _init_worker(slide_path, mask_info)
        results = [_tile_one(j) for j in jobs]
        _worker_state["slide"].close()
        _worker_state.clear()
    return [r for r in results if r is not None]


def tile_slide_nested(
    slide_path: str,
    out_dir: str,
    cfg: TilerConfig,
    annotation_xml: Optional[str] = None,
    mag_levels: Sequence[int] = (0,),
) -> List[Tuple[int, int, Optional[int]]]:
    """Multi-magnification tiling into one bag directory (the reference's
    `nested_patches` 2-level pyramid mode, deepzoom_tiler_camelyon16.py:
    256-295): the LOW-magnification patches sit at the bag root and each
    low patch `{c}_{r}-{lvl}` owns a folder of the `(2^Δ)²` high-mag
    patches it covers. (The reference's own implementation of this branch
    is dead code — its cleanup `os.rmdir` on a populated folder and
    `os.remove` of an already-moved file both raise — so this reproduces
    the organizing intent, which is the DSMIL nested-bag layout it was
    derived from.)

    With one level this is exactly `tile_slide`. Returns the kept tuples of
    the FINEST level — restricted to patches actually moved under a kept
    low-mag parent (a high tile whose parent was background-filtered never
    leaves the temporary directory, so returning it would put rows in
    tile_label.csv for files that don't exist)."""
    if len(mag_levels) == 1:
        return tile_slide(slide_path, out_dir, cfg, annotation_xml,
                          mag_level=mag_levels[0])
    if len(mag_levels) != 2:
        raise ValueError("nested tiling supports 1 or 2 magnification levels")
    lo, hi = max(mag_levels), min(mag_levels)  # lo = more downsampled
    factor = 2 ** (lo - hi)
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        hi_dir = os.path.join(tmp, "hi")
        kept_hi = tile_slide(slide_path, hi_dir, cfg, annotation_xml,
                             mag_level=hi)
        kept_lo = tile_slide(slide_path, out_dir, cfg, None, mag_level=lo)
        import shutil

        hi_names = {}  # (col, row) -> filename
        for f in os.listdir(hi_dir):
            stem = f.split(".")[0].split("-")[0]
            c, r = stem.split("_")
            hi_names[(int(c), int(r))] = f
        moved = set()
        for col, row, _ in kept_lo:
            sub = None
            for dc in range(factor):
                for dr in range(factor):
                    key = (col * factor + dc, row * factor + dr)
                    if key in hi_names:
                        if sub is None:
                            # folder named after the low patch's stem
                            low_name = [
                                f for f in os.listdir(out_dir)
                                if f.split(".")[0].split("-")[0]
                                == f"{col}_{row}"
                                and os.path.isfile(os.path.join(out_dir, f))
                            ]
                            stem = low_name[0].split(".")[0]
                            sub = os.path.join(out_dir, stem)
                            os.makedirs(sub, exist_ok=True)
                        fname = hi_names.pop(key)
                        shutil.move(os.path.join(hi_dir, fname),
                                    os.path.join(sub, fname))
                        moved.add(key)
    return [(c, r, lab) for c, r, lab in kept_hi if (c, r) in moved]


def append_tile_labels(
    csv_path: str, slide_name: str,
    kept: Sequence[Tuple[int, int, Optional[int]]],
):
    """Single-writer tile_label.csv append ('{slide}_{col}_{row},label') —
    the race-free replacement for the reference's per-worker appends."""
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    with open(csv_path, "a") as f:
        for col, row, label in kept:
            if label is not None:
                f.write(f"{slide_name}_{col}_{row},{label}\n")
