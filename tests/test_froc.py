"""FROC evaluation on synthetic masks: dilation/ITC rules, TP/FP
assignment, curve and challenge score (reference froc.py semantics)."""

import numpy as np
import pytest

from snuffy_tpu.eval.froc import (
    ArrayMaskReader,
    MaskLevel,
    compute_evaluation_mask,
    compute_froc,
    compute_probabilities,
    compute_score,
    froc_for_slides,
    major_axis_lengths,
    scale_detections,
)


def synthetic_mask(downsample=32.0, spacing=1.0):
    """100×100 level-5 mask: a 20×20 tumor block and a 1-px ITC."""
    arr = np.zeros((100, 100), np.uint8)
    arr[10:30, 10:30] = 2    # real tumor
    arr[70, 70] = 2          # isolated tumor cell
    return ArrayMaskReader({5: MaskLevel(arr, downsample, spacing)})


def test_evaluation_mask_and_itc_detection():
    mask = synthetic_mask()
    labeled, itcs = compute_evaluation_mask(mask, 5, include_itcs=False)
    n_labels = labeled.max()
    assert n_labels == 2
    assert len(itcs) == 1
    # The ITC is the single-pixel region (the one containing (70,70)).
    itc_label = labeled[70, 70]
    assert itc_label in itcs
    assert labeled[20, 20] not in itcs
    # Dilation: threshold 75/(32·2) ≈ 1.17 px → the block grew by 1 px.
    assert labeled[9, 20] == labeled[20, 20]

    # With ITCs included, no region is dropped.
    _, itcs2 = compute_evaluation_mask(mask, 5, include_itcs=True)
    assert itcs2 == set()


def test_major_axis_lengths_square():
    arr = np.zeros((50, 50), int)
    arr[10:30, 10:30] = 1
    lengths = major_axis_lengths(arr, 1)
    # uniform 20×20 square: var=(20²−1)/12 → major ≈ 4·√33.25 ≈ 23.06
    assert lengths[1] == pytest.approx(23.06, abs=0.1)


def test_tp_fp_assignment_and_score():
    mask = synthetic_mask()
    labeled, itcs = compute_evaluation_mask(mask, 5, include_itcs=False)
    down = 32.0
    # detections at level-0 coords: inside tumor, background, inside ITC
    dets = [(0.9, 20 * down, 20 * down),
            (0.8, 50 * down, 50 * down),
            (0.7, 70 * down, 70 * down)]
    items = scale_detections(dets, down)
    fp, tp, count = compute_probabilities(items, labeled, itcs)
    assert fp == [0.8]
    assert count == 1            # 2 regions − 1 ITC
    assert max(tp) == 0.9        # the tumor hit
    assert 0.7 not in fp and 0.7 not in tp  # ITC hit dropped entirely

    froc_data = {"tumor_001": {"fp": fp, "tp": [0.9], "count": 1}}
    avg_fps, sens, thresholds = compute_froc(froc_data)
    assert thresholds == [0.8, 0.9]
    assert avg_fps == [1.0, 0.0, 0.0]
    assert sens == [1.0, 1.0, 0.0]
    assert compute_score(avg_fps, sens) == pytest.approx(1.0)


def test_normal_slide_all_fp():
    fp, tp, count = compute_probabilities(
        [(0.6, 5, 5), (0.4, 6, 6)], None, set()
    )
    assert fp == [0.6, 0.4] and tp == [] and count == 0


def test_froc_for_slides_end_to_end():
    mask = synthetic_mask()
    down = 32.0
    detections = {
        "tumor_001": [(0.9, 20 * down, 20 * down), (0.3, 60 * down, 60 * down)],
        "normal_001": [(0.5, 10 * down, 10 * down)],
    }
    types = {"tumor_001": "tumor", "normal_001": "normal"}
    score, avg_fps, sens = froc_for_slides(
        detections, lambda s: mask, types, evaluation_mask_level=5
    )
    # sensitivity 1 is reached while FP/slide ≤ 0.5 → score < 1 only below
    # the 0.25 target; expected: at threshold 0.9 → 0 FP, sens 1.
    assert 0.8 <= score <= 1.0
    assert max(sens) == 1.0


def test_missed_tumor_reduces_score():
    mask = synthetic_mask()
    down = 32.0
    detections = {"tumor_001": [(0.9, 50 * down, 50 * down)]}  # background
    types = {"tumor_001": "tumor"}
    score, _, sens = froc_for_slides(
        detections, lambda s: mask, types, evaluation_mask_level=5
    )
    assert score == 0.0
    assert max(sens) == 0.0


def test_froc_cli_end_to_end(tmp_path):
    """Root froc.py CLI on detection CSVs + a real mask TIFF."""
    import pandas as pd
    from PIL import Image

    import froc as cli

    masks = tmp_path / "masks"
    masks.mkdir()
    size, tumor = 2048, 1200
    arr = np.zeros((size, size), np.uint8)
    arr[:tumor, :tumor] = 2
    Image.fromarray(arr).save(str(masks / "tumor_001_mask.tif"))

    dets = tmp_path / "detections"
    dets.mkdir()
    pd.DataFrame(
        {"p": [0.9, 0.3], "x": [256, 1800], "y": [256, 1800]}
    ).to_csv(dets / "tumor_001.csv", index=False)
    pd.DataFrame({"p": [0.5], "x": [100], "y": [100]}).to_csv(
        dets / "normal_001.csv", index=False
    )
    ref = tmp_path / "reference.csv"
    pd.DataFrame(
        {"image": ["tumor_001.tif", "normal_001.tif"],
         "type": ["tumor", "normal"]}
    ).to_csv(ref, index=False)

    score = cli.main([
        "--reference", str(ref), "--masks", str(masks),
        "--detections", str(dets), "--level", "5",
        "--result", str(tmp_path / "froc.csv"),
        "--plot", str(tmp_path / "froc.png"),
    ])
    assert 0.0 < score <= 1.0
    assert (tmp_path / "froc.csv").exists()
    assert (tmp_path / "froc.png").exists()


def _pyramid_levels(seed=0):
    """Realistic mask pyramid: odd level-0 dims (non-ideal ratios), a tumor
    region plus an ITC, floor-divided downsamples like real scanner files."""
    arr0 = np.zeros((3999, 3001), np.uint8)
    arr0[300:1000, 400:1100] = 2     # tumor
    arr0[2400:2410, 2200:2210] = 2   # ITC at level 5 scale
    levels = [arr0]
    for _ in range(6):
        levels.append(levels[-1][::2, ::2].copy())
    return levels


@pytest.mark.parametrize("reader_cls", ["native", "pil"])
def test_froc_through_file_based_readers(tmp_path, reader_cls):
    """FROC parity through a realistic multi-page mask TIF (per-page
    resolution tags, non-power-of-2 ratios) written by the native tiled-TIFF
    writer — the file path must reproduce the ArrayMaskReader result
    (reference froc.py:93-106 reads geometry from the file)."""
    from snuffy_tpu import native
    from snuffy_tpu.eval.froc import NativeMaskReader, PILMaskReader

    if not native.available():
        pytest.skip("native library unavailable")

    spacing = 0.243 * 32  # large spacing: keeps the dilation local at lvl 5
    levels = _pyramid_levels()
    path = str(tmp_path / "tumor_realistic.tif")
    native.write_tiled_tiff_gray(path, levels, tile=64, spacing_um=spacing)

    level = 5
    w0, wl = levels[0].shape[1], levels[level].shape[1]
    oracle = ArrayMaskReader(
        {level: MaskLevel(levels[level], w0 / wl, spacing)}
    )

    reader = (NativeMaskReader(path) if reader_cls == "native"
              else PILMaskReader(path, default_spacing_um=-1.0))

    got = reader.read(level)
    want = oracle.read(level)
    np.testing.assert_array_equal(got.array, want.array)
    assert got.downsample == pytest.approx(want.downsample)
    assert got.spacing_um == pytest.approx(want.spacing_um, rel=1e-5)

    ev_f, itc_f = compute_evaluation_mask(reader, level, include_itcs=False)
    ev_a, itc_a = compute_evaluation_mask(oracle, level, include_itcs=False)
    np.testing.assert_array_equal(ev_f, ev_a)
    assert itc_f == itc_a
    assert itc_a, "fixture should produce at least one ITC region"

    down = got.downsample
    detections = {
        "tumor_r": [(0.9, 25 * down, 20 * down),   # inside tumor
                    (0.4, 85 * down, 80 * down)],  # background FP
    }
    types = {"tumor_r": "tumor"}
    s_file, fp_file, sens_file = froc_for_slides(
        detections, lambda s: reader, types, evaluation_mask_level=level
    )
    s_arr, fp_arr, sens_arr = froc_for_slides(
        detections, lambda s: oracle, types, evaluation_mask_level=level
    )
    assert s_file == pytest.approx(s_arr)
    assert fp_file == fp_arr and sens_file == sens_arr


def test_eval_mask_cache_roundtrip(tmp_path):
    """EvalMaskCache (the working version of the reference's vestigial
    use_cache, froc.py:450-451): identical scores with and without the
    cache, masks computed once per (path, level) across repeated sweeps,
    and npz persistence serving a second cache instance."""
    from PIL import Image

    from snuffy_tpu.eval.froc import EvalMaskCache

    masks = tmp_path / "masks"
    masks.mkdir()
    size, tumor = 2048, 1200
    arr = np.zeros((size, size), np.uint8)
    arr[:tumor, :tumor] = 2
    Image.fromarray(arr).save(str(masks / "tumor_001_mask.tif"))

    detections = {"tumor_001": [(0.9, 256, 256), (0.3, 1800, 1800)]}
    types = {"tumor_001": "tumor"}

    def mask_for(s):
        return str(masks / f"{s}_mask.tif")

    base_score, base_fps, base_sens = froc_for_slides(
        detections, mask_for, types, evaluation_mask_level=5)

    cache = EvalMaskCache(directory=str(tmp_path / "cache"))
    calls = {"n": 0}
    orig = cache.get

    def counting_get(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    cache.get = counting_get
    for _ in range(3):  # a sweep: same masks, three runs
        s, fps, sens = froc_for_slides(
            detections, mask_for, types, evaluation_mask_level=5,
            mask_cache=cache)
        assert s == pytest.approx(base_score)
        assert fps == base_fps and sens == base_sens
    assert calls["n"] == 3
    assert len(cache._mem) == 1  # one mask computed, reused twice

    # a fresh process (new cache object) restores from the npz
    cache2 = EvalMaskCache(directory=str(tmp_path / "cache"))
    import snuffy_tpu.eval.froc as froc_mod
    real_compute = froc_mod.compute_evaluation_mask

    def boom(*a, **k):
        raise AssertionError("recompute despite npz cache")

    froc_mod.compute_evaluation_mask = boom
    try:
        s2, _, _ = froc_for_slides(
            detections, mask_for, types, evaluation_mask_level=5,
            mask_cache=cache2)
    finally:
        froc_mod.compute_evaluation_mask = real_compute
    assert s2 == pytest.approx(base_score)

    # npz publication is atomic (temp + os.replace): no half-written
    # .tmp files may linger for a concurrent reader to trip over
    leftovers = [p for p in (tmp_path / "cache").iterdir()
                 if ".tmp" in p.name]
    assert leftovers == []

    # a REGENERATED mask file (same name, new content/mtime) must
    # invalidate — stale cache entries silently corrupt FROC scores
    import os as _os
    import time as _time

    _time.sleep(0.01)
    arr2 = np.zeros((size, size), np.uint8)
    arr2[:tumor // 2, :tumor // 2] = 2   # smaller tumor region
    Image.fromarray(arr2).save(str(masks / "tumor_001_mask.tif"))
    _os.utime(str(masks / "tumor_001_mask.tif"))
    n_npz_before = len(list((tmp_path / "cache").glob("*.npz")))
    cache3 = EvalMaskCache(directory=str(tmp_path / "cache"))
    s3, _, sens3 = froc_for_slides(
        detections, mask_for, types, evaluation_mask_level=5,
        mask_cache=cache3)
    s3_ref, _, sens3_ref = froc_for_slides(
        detections, mask_for, types, evaluation_mask_level=5)
    assert s3 == pytest.approx(s3_ref) and sens3 == sens3_ref
    # the rewritten file got a NEW key (mtime/size stamp) -> a second npz
    assert len(list((tmp_path / "cache").glob("*.npz"))) == n_npz_before + 1
