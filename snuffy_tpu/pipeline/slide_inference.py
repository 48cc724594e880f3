"""End-to-end single-slide inference: WSI → tiles → embeddings → bag score.

The BASELINE.json north star ("embed + classify a full ~10k-patch slide on
one chip in <2 s") has no counterpart in the reference — its stages only
communicate through JPEG/CSV files on disk (SURVEY.md §1). This pipeline is
the TPU-native redesign: tiles stream from the native libtiff reader
straight into fixed-size device batches (no JPEG encode/decode round trip),
the embedder and the Snuffy aggregator run as two jitted programs, and the
only host↔device traffic is raw patches in and a handful of scores out.

Stages (timed separately):
  1. read+filter — process-pool region reads + edge-energy background
     filter (tiling/deepzoom.py semantics);
  2. embed — static-batch jitted embedder forward (bf16-capable);
  3. classify — Snuffy MILNet on the padded bag.
"""

from __future__ import annotations

import multiprocessing as mp
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from snuffy_tpu.tiling.deepzoom import TilerConfig, edge_energy, pick_read_level


@dataclass
class SlidePrediction:
    bag_score: float
    instance_scores: np.ndarray     # (N,)
    positions: List[Tuple[int, int]]  # (col, row) per kept tile
    timings: dict


_reader_state: dict = {}


def _init_reader(slide_path):
    from snuffy_tpu.native import NativeSlide

    _reader_state["slide"] = NativeSlide(slide_path)


def _read_tile(args):
    col, row, level, read, tile, threshold = args
    import cv2

    slide = _reader_state["slide"]
    region = slide.read_region(level, col * read, row * read, read, read)
    if read != tile:
        region = cv2.resize(region, (tile, tile), interpolation=cv2.INTER_AREA)
    if edge_energy(region) <= threshold:
        return None
    return col, row, region


def read_slide_tiles(
    slide_path: str,
    cfg: TilerConfig,
    workers: int = 8,
) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """WSI → (kept_tiles (N, t, t, 3) uint8, positions)."""
    from snuffy_tpu.native import NativeSlide

    slide = NativeSlide(slide_path)
    target_down = cfg.objective_power / cfg.base_mag
    level, residual = pick_read_level(slide, target_down)
    read = int(round(cfg.tile_size * residual))
    lw, lh = slide.level_dimensions(level)
    cols, rows = lw // read, lh // read
    slide.close()

    jobs = [
        (c, r, level, read, cfg.tile_size, cfg.background_threshold)
        for r in range(rows)
        for c in range(cols)
    ]
    if workers > 1:
        with mp.Pool(workers, initializer=_init_reader,
                     initargs=(slide_path,)) as pool:
            results = pool.map(_read_tile, jobs)
    else:
        _init_reader(slide_path)
        results = [_read_tile(j) for j in jobs]
        _reader_state["slide"].close()
        _reader_state.clear()
    kept = [r for r in results if r is not None]
    if not kept:
        return np.zeros((0, cfg.tile_size, cfg.tile_size, 3), np.uint8), []
    positions = [(c, r) for c, r, _ in kept]
    tiles = np.stack([t for _, _, t in kept])
    return tiles, positions


def predict_slide(
    slide_path: str,
    embed_fn,                 # jitted (backbone_params, head_params, imgs)
    embedder_params,
    embedder_head_params,
    milnet_apply,             # (params, feats (N_pad, D), mask) → scores
    milnet_params,
    tiler_cfg: Optional[TilerConfig] = None,
    embed_batch: int = 256,
    embed_size: int = 224,
    imagenet_norm: bool = False,  # retained for API; bake into embed_fn via
                                  # Embedder.jit_apply(imagenet_norm=True)
    workers: int = 8,
) -> SlidePrediction:
    import cv2
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.data.bucketing import pad_bag
    from snuffy_tpu.embed.pipeline import IMAGENET_MEAN, IMAGENET_STD

    tiler_cfg = tiler_cfg or TilerConfig()
    timings = {}

    t0 = time.perf_counter()
    tiles, positions = read_slide_tiles(slide_path, tiler_cfg, workers)
    timings["read_filter_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = len(tiles)
    feats_chunks = []
    for start in range(0, n, embed_batch):
        chunk = tiles[start:start + embed_batch]
        if chunk.shape[1] != embed_size:
            chunk = np.stack([
                cv2.resize(t, (embed_size, embed_size)) for t in chunk
            ])
        # ship uint8; the jitted embedder casts/normalizes on device
        # (4x less host->device traffic than float32 pixels)
        batch = chunk
        if len(chunk) < embed_batch:
            batch = np.concatenate([
                batch,
                np.zeros((embed_batch - len(chunk),) + batch.shape[1:],
                         np.uint8),
            ])
        feats, _ = embed_fn(embedder_params, embedder_head_params,
                            jnp.asarray(batch))
        feats_chunks.append(np.asarray(feats)[: len(chunk)])
    feats = (np.concatenate(feats_chunks) if feats_chunks
             else np.zeros((0, 1), np.float32))
    timings["embed_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    padded, mask = pad_bag(feats.astype(np.float32))
    ins_scores, bag_score = milnet_apply(
        milnet_params, jnp.asarray(padded), jnp.asarray(mask)
    )
    ins_scores = np.asarray(ins_scores)[:n]
    bag = float(np.asarray(bag_score))
    timings["classify_s"] = time.perf_counter() - t0
    timings["total_s"] = sum(timings.values())
    timings["n_patches"] = n

    return SlidePrediction(bag, ins_scores.reshape(-1), positions, timings)
