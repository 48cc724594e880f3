"""SSL pretraining CLIs end-to-end on tiny synthetic image folders."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_image_folder(root, n_per_class=40, size=32):
    # 80 images: with the dp-sharded CLIs the per-process batch is
    # batch_size_per_gpu x 8 virtual devices = 32, so 2 full iters/epoch
    # survive drop_last — the CLI smoke tests exercise the real dp path.
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


def test_bool_flag_parsing():
    """type=bool maps '--flag False' to True; bool_flag must not (reference
    dino_adapter/utils.py:206-218)."""
    import main_dino_adapter as dino_cli
    import main_pretrain_adapter as mae_cli

    args = dino_cli.get_args_parser().parse_args(
        ["--norm_last_layer", "False", "--use_adapter", "false",
         "--use_bn_in_head", "true"]
    )
    assert args.norm_last_layer is False
    assert args.use_adapter is False
    assert args.use_bn_in_head is True
    args = mae_cli.get_args_parser().parse_args(["--use_adapter", "0"])
    assert args.use_adapter is False
    with pytest.raises(SystemExit):
        dino_cli.get_args_parser().parse_args(["--norm_last_layer", "maybe"])


def test_dino_cli_resume_restores_opt_state(tmp_path, tiny_vit_factories):
    """Resume restores model + optimizer + BN state (reference
    restart_from_checkpoint, dino_adapter/utils.py:157-189): the Adam
    moments in the rolling checkpoint round-trip bit-exactly and a second
    invocation continues from the stored epoch."""
    import jax
    import numpy as np
    from flax import serialization

    import main_dino_adapter as cli

    data = str(tmp_path / "imgs")
    _make_image_folder(data)
    argv = [
        "--arch=vit_tiny", "--batch_size_per_gpu=4",
        f"--data_path={data}", f"--output_dir={tmp_path}/out",
        "--num_workers=0", "--img_size=32", "--global_size=32",
        "--local_size=16", "--local_crops_number=2", "--out_dim=32",
        "--warmup_epochs=1", "--max_steps_per_epoch=2",
    ]
    state1 = cli.train_dino(
        cli.get_args_parser().parse_args(argv + ["--epochs=2"])
    )

    template = {
        "student": state1.student, "teacher": state1.teacher,
        "center": state1.center, "step": state1.step,
        "opt_state": state1.opt_state, "bn_stats": state1.bn_stats,
        "epoch": 0,
    }
    with open(str(tmp_path / "out" / "checkpoint.msgpack"), "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    assert payload["epoch"] == 1
    restored = jax.tree_util.tree_leaves(payload["opt_state"])
    live = jax.tree_util.tree_leaves(state1.opt_state)
    assert any(np.any(np.asarray(l) != 0) for l in live), "moments all zero"
    for r, l in zip(restored, live):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(l))

    # second invocation resumes at epoch 2 and trains one more epoch
    state2 = cli.train_dino(
        cli.get_args_parser().parse_args(argv + ["--epochs=3"])
    )
    assert int(np.asarray(state2.step)) == 6  # 3 epochs × 2 steps
    import json
    log = [json.loads(l) for l in
           open(str(tmp_path / "out" / "log.txt")).read().strip().splitlines()]
    assert [r["epoch"] for r in log] == [0, 1, 2]


def test_mae_cli_resume_restores_opt_state(tmp_path, tiny_mae_factory):
    """Resume restores params + optimizer state (reference
    mae_adapter/util/misc.py:317-333)."""
    import jax
    import numpy as np
    from flax import serialization

    import main_pretrain_adapter as cli

    data = str(tmp_path / "imgs")
    _make_image_folder(data)
    argv = [
        "--model=mae_vit_base_patch16", "--batch_size=4",
        f"--data_path={data}", f"--output_dir={tmp_path}/out",
        "--num_workers=0", "--input_size=32", "--warmup_epochs=1",
        "--max_steps_per_epoch=2",
    ]
    state1 = cli.train_mae(
        cli.get_args_parser().parse_args(argv + ["--epochs=2"])
    )
    template = {"params": state1.params, "opt_state": state1.opt_state,
                "step": state1.step, "epoch": 0}
    with open(str(tmp_path / "out" / "checkpoint.msgpack"), "rb") as f:
        payload = serialization.from_bytes(template, f.read())
    assert payload["epoch"] == 1
    live = jax.tree_util.tree_leaves(state1.opt_state)
    assert any(np.any(np.asarray(l) != 0) for l in live)
    for r, l in zip(jax.tree_util.tree_leaves(payload["opt_state"]), live):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(l))

    state2 = cli.train_mae(
        cli.get_args_parser().parse_args(argv + ["--epochs=3"])
    )
    assert int(np.asarray(state2.step)) == 6


def test_dino_cli_resumes_legacy_checkpoint(tmp_path, tiny_vit_factories):
    """A pre-optimizer-state rolling checkpoint (model-only layout) must
    still resume — moments reset with a warning — instead of raising on
    the stricter template (upgrade-path regression guard)."""
    import numpy as np
    from flax import serialization

    import main_dino_adapter as cli

    data = str(tmp_path / "imgs")
    _make_image_folder(data)
    argv = [
        "--arch=vit_tiny", "--batch_size_per_gpu=4",
        f"--data_path={data}", f"--output_dir={tmp_path}/out",
        "--num_workers=0", "--img_size=32", "--global_size=32",
        "--local_size=16", "--local_crops_number=2", "--out_dim=32",
        "--warmup_epochs=1", "--max_steps_per_epoch=1",
    ]
    state1 = cli.train_dino(
        cli.get_args_parser().parse_args(argv + ["--epochs=1"])
    )
    # rewrite the rolling checkpoint in the LEGACY (model-only) layout
    legacy = {
        "student": state1.student, "teacher": state1.teacher,
        "center": state1.center, "step": state1.step, "epoch": 0,
    }
    with open(str(tmp_path / "out" / "checkpoint.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(legacy))
    state2 = cli.train_dino(
        cli.get_args_parser().parse_args(argv + ["--epochs=2"])
    )
    assert int(np.asarray(state2.step)) == 2  # resumed at epoch 1, +1 step
