"""Worker for the REAL 2-process multi-host validation
(tests/test_multihost_real.py): two of these form a jax.distributed CPU
cluster (gloo) with 4 virtual devices per process and run the actual
multi-host code paths — `parallel.distributed.initialize` from env vars,
`shard_batch_global`'s `make_array_from_process_local_data` branch, the
dcn=2 sharded MIL train step, `global_min_int`/`sync_epoch_row` over the
real wire, and the DINO CLI end to end with UNEQUAL per-host batch counts
(the deadlock case the iteration-agreement guard exists for).

Usage: python tools/multihost_worker.py <process_id> <port> <workdir>
Prints one `RESULT <json>` line; the orchestrating test asserts on it.
"""

import json
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]
WORK = sys.argv[3]

# Must happen before any jax device use; the env var alone can't override
# the sitecustomize axon platform (CLAUDE.md) — config.update below does.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(PID)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from snuffy_tpu.parallel import distributed  # noqa: E402

distributed.initialize()  # env-var path
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

out = {"pid": PID}

# --- 1. global_min_int over the real wire (the deadlock guard) ----------
from snuffy_tpu.utils.metrics_sync import (  # noqa: E402
    global_min_int,
    sync_epoch_row,
    sync_metrics,
)

out["global_min"] = global_min_int(5 if PID == 0 else 3)  # expect 3 both

# --- 2. sync_metrics with a None on ONE host only ------------------------
row = {"train_loss": 2.0 + PID, "val_loss": (7.0 if PID == 1 else None),
       "n": float(3 + PID)}
red = sync_metrics(row, weight_key="n")
out["sync_n"] = red["n"]                       # 3 + 4 = 7
out["sync_train"] = round(red["train_loss"], 6)  # (2*3 + 3*4)/7
out["sync_val"] = red["val_loss"]              # host1's 7.0, weight 4

# --- 3. shard_batch_global: the multi-host branch ------------------------
from snuffy_tpu.parallel.ssl_sharding import (  # noqa: E402
    dp_mesh,
    replicate_state,
    shard_batch_global,
)

mesh = dp_mesh()  # 8 global devices
local = np.full((4, 2), float(PID), np.float32)  # each host feeds 4 rows
g = shard_batch_global(local, mesh)
assert g.shape == (8, 2)
total = float(jax.jit(lambda x: x.sum())(g))    # 0*8 + 1*8 = 8
out["shard_sum"] = total

# --- 4. dcn=2 sharded MIL train step -------------------------------------
from snuffy_tpu.configs import (  # noqa: E402
    MILTrainConfig,
    OptimizerConfig,
    SnuffyModelConfig,
)
from snuffy_tpu.parallel.mesh import make_mesh  # noqa: E402
from snuffy_tpu.parallel.sharded_train import (  # noqa: E402
    fetch_batch_outputs,
    make_global_batch,
    make_sharded_batch_train_step,
    shard_state,
)
from snuffy_tpu.train.trainer import SnuffyTrainer  # noqa: E402

spec = distributed.global_mesh_spec()
assert spec.dcn == 2
mil_mesh = make_mesh(spec, num_heads=2)
cfg = MILTrainConfig(
    model=SnuffyModelConfig(feats_size=16, num_heads=2, big_lambda=8,
                            random_patch_share=0.0, attention_dropout=0.0,
                            encoder_dropout=0.0, use_pallas=False),
    optim=OptimizerConfig(optimizer="adamw", lr=1e-3),
    soft_average=True,
)
trainer = SnuffyTrainer(cfg)  # bag_batch_size=1 → no auto mesh

rng = np.random.default_rng(0)  # identical bags on both hosts
batch, n_pad = 8, 64
feats = rng.standard_normal((batch, n_pad, 16)).astype(np.float32)
masks = np.ones((batch, n_pad), bool)
labels = rng.integers(0, 2, (batch, 1)).astype(np.float32)
with mil_mesh:
    state = shard_state(trainer.init_state(0, example_n=n_pad), mil_mesh)
    step = make_sharded_batch_train_step(trainer, mil_mesh)
    gfeats, gmasks, glabels, gw = make_global_batch(
        mil_mesh, feats, masks, labels, np.ones((batch,), np.float32)
    )
    state, losses, scores, _ = step(
        state, gfeats, gmasks, glabels, gw,
        np.float32(1e-3), jax.random.PRNGKey(7),
    )
    (losses_np,) = fetch_batch_outputs(losses)
    out["mil_loss"] = round(float(np.mean(losses_np)), 6)

# --- 5. DINO CLI end to end, UNEQUAL per-host batch counts ---------------
# 24 train images stride-split 12/12 -> 1 batch each (batch 2/dev x 4);
# 15 valid images split 8/7 -> 1 vs 0 batches: without the
# iteration-agreement guard host 0 would hang in a collective here.
from snuffy_tpu.models import vit as vit_mod  # noqa: E402


def tiny(**kw):
    kw.pop("patch_size", None)
    return vit_mod.VisionTransformer(
        patch_size=8, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0,
        **kw,
    )


vit_mod.vit_tiny = tiny

import main_dino_adapter as cli  # noqa: E402

args = cli.get_args_parser().parse_args([
    "--arch=vit_tiny", "--epochs=1", "--batch_size_per_gpu=2",
    f"--data_path={WORK}/imgs", f"--valid_data_path={WORK}/val",
    f"--output_dir={WORK}/out{PID}",
    "--num_workers=0", "--img_size=32", "--global_size=32",
    "--local_size=16", "--local_crops_number=2", "--out_dim=32",
    "--warmup_epochs=1",
])
state = cli.train_dino(args)
out["dino_step"] = int(np.asarray(state.step))
log_path = os.path.join(f"{WORK}/out{PID}", "log.txt")
out["wrote_log"] = os.path.exists(log_path)
if out["wrote_log"]:
    rows = [json.loads(l) for l in open(log_path).read().splitlines()]
    out["dino_train_loss"] = rows[-1]["train_loss"]
    out["dino_val_loss"] = rows[-1]["val_loss"]

# --- 5b. MAE CLI end to end ----------------------------------------------
# Covers its own loop code under real multi-host: uint8 batch sharding,
# global blr rule, synced val means, best-val checkpoint on process 0.
from snuffy_tpu.models import mae as mae_mod  # noqa: E402


def tiny_mae(**kw):
    kw.pop("patch_size", None)
    return mae_mod.MaskedAutoencoderViT(
        patch_size=8, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        mlp_ratio=2.0, **kw,
    )


mae_mod.mae_vit_base_patch16 = tiny_mae

import main_pretrain_adapter as mae_cli  # noqa: E402

mae_args = mae_cli.get_args_parser().parse_args([
    "--model=mae_vit_base_patch16", "--epochs=1", "--batch_size=2",
    f"--data_path={WORK}/imgs", f"--valid_data_path={WORK}/imgs",
    f"--output_dir={WORK}/mae{PID}", "--num_workers=0",
    "--input_size=32", "--warmup_epochs=1",
])
mae_state = mae_cli.train_mae(mae_args)
out["mae_step"] = int(np.asarray(mae_state.step))
out["mae_best"] = sorted(
    f for f in os.listdir(f"{WORK}/mae{PID}")
    if f.startswith("checkpoint-best-")
)

# --- 6. multi-host feature extraction ------------------------------------
# Bags stride-split across hosts; the artifact tree is written AFTER a
# real sync_global_devices barrier, by process 0 only (compute_feats.py).
from snuffy_tpu.embed.registry import build_embedder  # noqa: E402
from snuffy_tpu.embed.pipeline import extract_dataset  # noqa: E402

emb = build_embedder(embedder="SimCLR", backbone="resnet18",
                     num_classes=1, img_size=32)
emb.init_head(0)
rows = extract_dataset(
    emb, f"{WORK}/ds", "fold1", f"{WORK}/emb",
    class_labels={"a": 0, "b": 1}, batch_size=4, img_size=32,
)
out["extract_rows"] = len(rows)
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("worker_extract_check")
if PID == 0:
    import glob as _glob

    # all four bag CSVs exist regardless of which host embedded them
    out["extract_csvs"] = len([
        p for p in _glob.glob(f"{WORK}/emb/**/*.csv", recursive=True)
    ])

print("RESULT " + json.dumps(out), flush=True)
