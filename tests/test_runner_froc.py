"""Runner's CAMELYON16 FROC integration: detection construction from
instance scores + positions, scored against real TIFF masks on disk."""

import os

import numpy as np
import pytest

from snuffy_tpu.configs import MILTrainConfig, SnuffyModelConfig


def _write_mask_tif(path, size=2048, tumor_extent=1200):
    from PIL import Image

    arr = np.zeros((size, size), np.uint8)
    arr[:tumor_extent, :tumor_extent] = 2
    Image.fromarray(arr).save(path)


def test_camelyon16_froc_from_runner(tmp_path):
    import pandas as pd

    from snuffy_tpu.train.runner import Runner
    from snuffy_tpu.train.trainer import SnuffyTrainer

    masks = tmp_path / "masks"
    masks.mkdir()
    _write_mask_tif(str(masks / "tumor_001_mask.tif"))
    ref_csv = tmp_path / "reference.csv"
    pd.DataFrame(
        {"image": ["tumor_001.tif", "normal_001.tif"],
         "type": ["tumor", "normal"]}
    ).to_csv(ref_csv, index=False)

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(feats_size=8, num_heads=2, big_lambda=4),
        dataset="camelyon16",
        camelyon16_mask_path=str(masks),
        camelyon16_reference=str(ref_csv),
        save_path=str(tmp_path / "runs"),
    )
    trainer = SnuffyTrainer(cfg)
    dummy = ([np.array([1.0])], [np.zeros((4, 8), np.float32)], None, None)
    runner = Runner(cfg, trainer, dummy, dummy, dummy)

    # Two bags: tumor slide with one hit + one miss; normal slide with one FP.
    data = (
        [np.array([1.0]), np.array([0.0])],
        [np.zeros((2, 8), np.float32), np.zeros((1, 8), np.float32)],
        [[1, 0], [0]],
        [["0_0", "2_2"], ["1_1"]],          # positions col_row
        ["tumor_001", "normal_001"],
    )
    ins_list = [np.array([0.9, 0.8]), np.array([0.6])]
    order = np.array([0, 1])

    score = runner._camelyon16_froc(data, ins_list, order, feat_threshold=0.5)
    # Patch (0,0) center (256,256) hits the 1200px tumor block → the single
    # tumor region is found; the curve reaches sensitivity 1.
    assert 0.0 < score <= 1.0

    # With the threshold above every score, nothing is detected.
    score0 = runner._camelyon16_froc(data, ins_list, order, feat_threshold=0.95)
    assert score0 == 0.0


def test_runner_sets_pos_weight_for_every_dataset(tmp_path):
    """The reference builds its pos-weighted BCEWithLogitsLoss from the
    train split unconditionally, for every dataset (train.py:244-247);
    Runner must do the same — it was once gated to the classic-MIL
    pickles, which only looked correct because camelyon16 splits are
    near-balanced."""
    from snuffy_tpu.train.runner import Runner
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(feats_size=8, num_heads=2, big_lambda=4),
        dataset="camelyon16",
        save_path=str(tmp_path / "runs"),
    )
    trainer = SnuffyTrainer(cfg)
    # 1 positive, 3 negatives → pos_weight = (4-1)/1 = 3
    labels = [np.array([1.0]), np.array([0.0]), np.array([0.0]),
              np.array([0.0])]
    feats = [np.zeros((4, 8), np.float32)] * 4
    train = (labels, feats, None, None)
    Runner(cfg, trainer, train, train, train)
    assert trainer.pos_weight == pytest.approx(3.0)
