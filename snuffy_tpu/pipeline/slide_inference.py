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


def _grid_geometry(slide_path: str, cfg: TilerConfig):
    from snuffy_tpu.native import NativeSlide

    slide = NativeSlide(slide_path)
    target_down = cfg.objective_power / cfg.base_mag
    level, residual = pick_read_level(slide, target_down)
    read = int(round(cfg.tile_size * residual))
    lw, lh = slide.level_dimensions(level)
    return slide, level, read, lw // read, lh // read


def _wrap_device_resize(embed_fn, embed_size: int):
    """Fold the embed-stage resize INTO the jitted embedder program.

    Removes the per-tile host cv2 work from the streaming loop (on the
    one-vCPU rig every host-side ms/tile serializes into the slide wall
    time; the dominant host cost is actually the pixel upload — see
    ROOFLINE.md §4). On device the resize is a negligible prologue to the
    ViT forward, and bilinear + antialias matches the reference's
    torchvision `Resize` transform semantics (reference
    compute_feats.py:104-153) more closely than cv2.INTER_AREA did.
    Input: uint8 (B, t, t, 3); the inner embed_fn receives float in [0,1]
    so its own uint8-normalize branch is skipped.
    """
    import jax
    import jax.numpy as jnp

    def fn(p, hp, im):
        imf = im.astype(jnp.float32) / 255.0
        imf = jax.image.resize(
            imf,
            (im.shape[0], embed_size, embed_size, im.shape[-1]),
            "linear",
            antialias=True,
        )
        return embed_fn(p, hp, imf)

    return jax.jit(fn)


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
    prefetch: Optional[bool] = None,
    scaled_decode: Optional[bool] = None,
) -> SlidePrediction:
    """Fused WSI → bag-score inference.

    When the native grid reader applies (aligned tiles; any tile→embed
    resize runs on device), tiles stream in row-blocks with a ONE-BLOCK
    PREFETCH thread: block i+1's JPEG decode (a GIL-releasing C call)
    runs while the main thread uploads + dispatches block i. The upload
    is the hidden cost on a thin relay link (~1.8 ms/tile measured — it
    was the unexplained 18 s in BENCH_r02's fused run). `prefetch=None`
    auto-enables the thread: even on a single-core host the upload's
    WIRE WAIT is overlappable — the r5 re-probe
    (tools/profile_decode_upload_overlap.py, after scaled decode cut
    decode work/bytes ~23%) measured 1.24× end-to-end with decode only
    ~15% slower under contention, overturning the r2 "prefetch slows
    decode 50%" measurement that used the heavier full-IDCT decode.
    Embeddings accumulate on device; the only device→host traffic is the
    final score vector. Timing keys:

      read_filter_s — time BLOCKED waiting for decode+filter (exposed
                      wait; the prefetch hides the rest under upload)
      read_decode_s — total worker-side decode+filter time (the C calls)
      embed_s       — embed tail: time blocked on the device AFTER the
                      last block was staged
      classify_s    — Snuffy forward on the padded on-device bag
      total_s       — true end-to-end wall time of the fused run
    """
    import jax
    import jax.numpy as jnp

    from snuffy_tpu import native
    from snuffy_tpu.data.bucketing import pad_bag

    tiler_cfg = tiler_cfg or TilerConfig()
    timings = {}
    t_start = time.perf_counter()

    fast = False
    scaled = False
    if native.available():
        slide, level, read, cols, rows = _grid_geometry(slide_path, tiler_cfg)
        fast = read == tiler_cfg.tile_size
        if (fast and tiler_cfg.tile_size != embed_size
                and scaled_decode is not False):
            # JPEG-tiled levels whose tile→embed ratio is an exact M/8
            # fraction (256→224 = 7/8) decode DIRECTLY at embed_size via
            # libjpeg's scaled IDCT: ~23% less decode work AND upload
            # bytes, and no resize program at all. The background filter
            # then runs at embed_size (the 7/8 IDCT only drops the top
            # frequency band; thresholds calibrated at tile_size carry
            # over — tests/test_slide_inference.py checks keep/drop and
            # score agreement vs the resize path).
            scaled = slide.scaled_grid_ok(level, read, embed_size)
        if not fast:
            slide.close()

    # Otherwise the embed-stage resize runs ON DEVICE (_wrap_device_resize)
    # — the streaming and fallback branches share the program so their
    # scores stay bit-comparable (tests/test_slide_inference.py).
    if tiler_cfg.tile_size != embed_size and not scaled:
        embed_fn = _wrap_device_resize(embed_fn, embed_size)

    if fast:
        # --- streaming fused path -------------------------------------
        # The relay pays a fresh remote compile for EVERY new program
        # shape, so the bag assembles into ONE preallocated (n_pad, D)
        # device buffer via a single donated dynamic_update_slice program
        # reused for all chunks — no per-chunk concat/pad programs, and
        # the buffer IS the padded classifier input.
        from snuffy_tpu.data.bucketing import bucket_length

        block_rows = max(1, -(-embed_batch // cols))  # ≥ embed_batch tiles
        positions: List[Tuple[int, int]] = []
        carry: List[np.ndarray] = []   # kept, not-yet-dispatched tiles
        n_carry = 0
        n_done = 0
        t_read = 0.0
        n_pad = bucket_length(cols * rows)
        # Over-allocate by one chunk: the final (padded) chunk writes at
        # start = n_done ≤ n_pad without dynamic_update_slice's start
        # clamping ever misaligning it; classify crops back to n_pad.
        n_alloc = n_pad + embed_batch
        feat_dim = None
        bag_buf = None
        write_chunk = jax.jit(
            lambda buf, f, start: jax.lax.dynamic_update_slice(
                buf, f.astype(buf.dtype), (start, 0)
            ),
            donate_argnums=(0,),
        )

        def dispatch(batch_np: np.ndarray, count: int):
            nonlocal bag_buf, feat_dim, n_done
            feats, _ = embed_fn(embedder_params, embedder_head_params,
                                jnp.asarray(batch_np))
            if bag_buf is None:
                feat_dim = feats.shape[-1]
                bag_buf = jnp.zeros((n_alloc, feat_dim), jnp.float32)
            # Rows past `count` hold padding-tile features; they land in
            # [n_done+count, …) and are either overwritten by the next
            # chunk or masked off (mask covers only n rows).
            bag_buf = write_chunk(bag_buf, feats, jnp.int32(n_done))
            n_done += count

        from concurrent.futures import ThreadPoolExecutor

        if prefetch is None:
            prefetch = True  # wins even at nproc=1 — see docstring
        t_decode = 0.0

        def _read_block(r0):
            nonlocal t_decode
            nb = min(block_rows, rows - r0)
            t0 = time.perf_counter()
            if scaled:
                tiles_blk, energy = slide.read_grid_scaled(
                    level, read, cols, nb, r0, embed_size)
            else:
                tiles_blk, energy = slide.read_grid(level, read, cols, nb, r0)
            t_decode += time.perf_counter() - t0
            return tiles_blk, energy

        starts = list(range(0, rows, block_rows))
        ex = ThreadPoolExecutor(max_workers=1) if prefetch else None
        if ex and starts:
            fut = ex.submit(_read_block, starts[0])
        for i, r0 in enumerate(starts):
            t0 = time.perf_counter()
            if ex:
                tiles_blk, energy = fut.result()
            else:
                tiles_blk, energy = _read_block(r0)
            t_read += time.perf_counter() - t0
            if ex and i + 1 < len(starts):
                fut = ex.submit(_read_block, starts[i + 1])
            keep = energy > tiler_cfg.background_threshold
            idx = np.nonzero(keep)[0]
            positions.extend(
                (int(j % cols), int(r0 + j // cols)) for j in idx
            )
            if idx.size:
                carry.append(tiles_blk[idx])
                n_carry += idx.size
            while n_carry >= embed_batch:
                buf = np.concatenate(carry) if len(carry) > 1 else carry[0]
                dispatch(buf[:embed_batch], embed_batch)
                rest = buf[embed_batch:]
                carry = [rest] if len(rest) else []
                n_carry = len(rest)
        if ex:
            ex.shutdown(wait=True)
        if n_carry:
            buf = np.concatenate(carry) if len(carry) > 1 else carry[0]
            pad = np.zeros((embed_batch - n_carry,) + buf.shape[1:],
                           np.uint8)
            dispatch(np.concatenate([buf, pad]), n_carry)
        slide.close()
        timings["read_filter_s"] = t_read
        timings["read_decode_s"] = t_decode
        # Which decode fed the filter/scores (scaled 7/8-IDCT tiles are
        # tolerance- but not bit-identical to the resize path) — recorded
        # so score drift on real slides is attributable (ADVICE r4).
        timings["decode_path"] = "grid_jpeg_scaled" if scaled else "grid"
        n = n_done

        if n == 0:
            # all-background slide: no tissue tiles, no evidence — don't
            # run the classifier on a bag whose feature dim is unknown
            timings["embed_s"] = 0.0
            timings["classify_s"] = 0.0
            timings["total_s"] = time.perf_counter() - t_start
            timings["n_patches"] = 0
            return SlidePrediction(0.0, np.zeros((0,), np.float32), [],
                                   timings)

        t0 = time.perf_counter()
        np.asarray(bag_buf)   # fence: pure transfer, no program
        timings["embed_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        mask = np.arange(n_pad) < n
        ins_scores, bag_score = milnet_apply(
            milnet_params, bag_buf[:n_pad], jnp.asarray(mask)
        )
        ins_scores = np.asarray(ins_scores)[:n]
        bag = float(np.asarray(bag_score))
        timings["classify_s"] = time.perf_counter() - t0
        timings["total_s"] = time.perf_counter() - t_start
        timings["n_patches"] = n
        return SlidePrediction(bag, ins_scores.reshape(-1), positions,
                               timings)

    # --- fallback: per-tile reads (non-aligned residual or no native) ---
    t0 = time.perf_counter()
    tiles, positions = read_slide_tiles(slide_path, tiler_cfg, workers)
    timings["read_filter_s"] = time.perf_counter() - t0
    timings["decode_path"] = "per_tile"

    t0 = time.perf_counter()
    n = len(tiles)
    feats_chunks = []
    for start in range(0, n, embed_batch):
        chunk = tiles[start:start + embed_batch]
        # ship uint8 at tile resolution; the jitted embedder resizes,
        # casts and normalizes on device
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
    timings["embed_s"] = time.perf_counter() - t0
    if not feats_chunks:
        # all-background slide (see the fast path's identical early return)
        timings["classify_s"] = 0.0
        timings["total_s"] = time.perf_counter() - t_start
        timings["n_patches"] = 0
        return SlidePrediction(0.0, np.zeros((0,), np.float32), [], timings)
    feats = np.concatenate(feats_chunks)

    t0 = time.perf_counter()
    padded, mask = pad_bag(feats.astype(np.float32))
    ins_scores, bag_score = milnet_apply(
        milnet_params, jnp.asarray(padded), jnp.asarray(mask)
    )
    ins_scores = np.asarray(ins_scores)[:n]
    bag = float(np.asarray(bag_score))
    timings["classify_s"] = time.perf_counter() - t0
    timings["total_s"] = time.perf_counter() - t_start
    timings["n_patches"] = n

    return SlidePrediction(bag, ins_scores.reshape(-1), positions, timings)
