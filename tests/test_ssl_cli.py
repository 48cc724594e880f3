"""SSL pretraining CLIs end-to-end on tiny synthetic image folders."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_image_folder(root, n_per_class=6, size=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        os.makedirs(os.path.join(root, cls), exist_ok=True)
        for i in range(n_per_class):
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, cls, f"{i}.jpeg"))


@pytest.fixture
def tiny_vit_factories(monkeypatch):
    from snuffy_tpu.models import vit as vit_mod

    def tiny(**kw):
        kw.pop("patch_size", None)
        return vit_mod.VisionTransformer(
            patch_size=8, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
            **kw,
        )

    monkeypatch.setattr(vit_mod, "vit_tiny", tiny)
    monkeypatch.setattr(vit_mod, "vit_small", tiny)
    return tiny


def test_dino_cli_smoke(tmp_path, tiny_vit_factories):
    import main_dino_adapter as cli

    data = str(tmp_path / "imgs")
    _make_image_folder(data)
    args = cli.get_args_parser().parse_args([
        "--arch=vit_tiny", "--epochs=2", "--batch_size_per_gpu=4",
        f"--data_path={data}", f"--valid_data_path={data}",
        f"--output_dir={tmp_path}/out",
        "--num_workers=0", "--img_size=32", "--global_size=32",
        "--local_size=16", "--local_crops_number=2", "--out_dim=32",
        "--warmup_epochs=1", "--max_steps_per_epoch=2",
    ])
    state = cli.train_dino(args)
    assert os.path.exists(str(tmp_path / "out" / "checkpoint.msgpack"))
    import json
    log = [json.loads(l) for l in
           open(str(tmp_path / "out" / "log.txt")).read().strip().splitlines()]
    assert len(log) == 2
    assert log[-1]["val_loss"] is not None


@pytest.fixture
def tiny_mae_factory(monkeypatch):
    from snuffy_tpu.models import mae as mae_mod

    def tiny(**kw):
        kw.pop("patch_size", None)
        return mae_mod.MaskedAutoencoderViT(
            patch_size=8, embed_dim=32, depth=1, num_heads=2,
            decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
            mlp_ratio=2.0, **kw,
        )

    monkeypatch.setattr(mae_mod, "mae_vit_base_patch16", tiny)
    return tiny


def test_mae_cli_smoke(tmp_path, tiny_mae_factory):
    import main_pretrain_adapter as cli

    data = str(tmp_path / "imgs")
    _make_image_folder(data)
    args = cli.get_args_parser().parse_args([
        "--model=mae_vit_base_patch16", "--epochs=2", "--batch_size=4",
        f"--data_path={data}", f"--valid_data_path={data}",
        f"--output_dir={tmp_path}/out", "--num_workers=0",
        "--input_size=32", "--warmup_epochs=1", "--max_steps_per_epoch=2",
    ])
    state = cli.train_mae(args)
    best = [f for f in os.listdir(str(tmp_path / "out"))
            if f.startswith("checkpoint-best-")]
    assert len(best) == 1  # previous best deleted
