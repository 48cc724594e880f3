"""DINO-with-Adapter SSL pretraining CLI — counterpart of the reference's
`python dino_adapter/main_dino_adapter.py` (reference
dino_adapter/main_dino_adapter.py:98-157 flags; SURVEY.md §3.4 call stack).

TPU-native pipeline per step (ONE jitted program after the host decode):
uint8 batch → device multi-crop augmentation → student(all views) /
teacher(2 globals) → DINOLoss with center EMA → masked AdamW update of
adapter+head → EMA teacher. Data parallelism = dp-sharded batch under jit
(replaces DDP/gloo, reference dino_adapter/utils.py:473-513).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

from snuffy_tpu.configs import bool_flag


def get_args_parser():
    p = argparse.ArgumentParser("DINO-adapter pretraining (TPU-native)")
    p.add_argument("--arch", default="vit_small",
                   choices=["vit_tiny", "vit_small", "vit_base"])
    p.add_argument("--patch_size", default=16, type=int)
    p.add_argument("--out_dim", default=65536, type=int)
    p.add_argument("--norm_last_layer", default=True, type=bool_flag)
    p.add_argument("--use_bn_in_head", default=False, type=bool_flag,
                   help="BatchNorm in the DINO projection head (reference "
                        "main_dino_adapter.py:91)")
    p.add_argument("--momentum_teacher", default=0.996, type=float)
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--teacher_temp", default=0.04, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=0, type=int)
    p.add_argument("--weight_decay", default=0.04, type=float)
    p.add_argument("--weight_decay_end", default=0.4, type=float)
    p.add_argument("--clip_grad", default=3.0, type=float)
    p.add_argument("--batch_size_per_gpu", default=64, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--freeze_last_layer", default=1, type=int)
    p.add_argument("--lr", default=0.0005, type=float)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--optimizer", default="adamw", type=str,
                   choices=["adamw", "sgd", "lars"],
                   help="adamw for ViTs; sgd/lars for convnets and large "
                        "batches (reference main_dino_adapter.py:117-119)")
    p.add_argument("--drop_path_rate", default=0.1, type=float,
                   help="stochastic depth rate")
    p.add_argument("--compute_dtype", default="bfloat16", type=str,
                   choices=["float32", "bfloat16"],
                   help="ViT block matmul dtype for student/teacher; bf16 "
                        "is the TPU-native fast path (params/loss stay f32)")
    p.add_argument("--global_crops_scale", type=float, nargs="+",
                   default=(0.4, 1.0))
    p.add_argument("--local_crops_number", default=8, type=int)
    p.add_argument("--local_crops_scale", type=float, nargs="+",
                   default=(0.05, 0.4))
    p.add_argument("--data_path", default="datasets/camelyon16/single",
                   type=str)
    p.add_argument("--valid_data_path", default=None, type=str)
    p.add_argument("--output_dir", default="runs/dino_adapter", type=str)
    p.add_argument("--saveckp_freq", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--full_checkpoint", default=None, type=str,
                   help="published DINO .pth to start from (frozen backbone)")
    p.add_argument("--random_head", default=0, type=int,
                   help="1 = train head from scratch even when the "
                        "checkpoint has one (reference "
                        "main_dino_adapter.py:155-157)")
    p.add_argument("--adapter_ffn_scalar", default=4.0, type=float)
    p.add_argument("--ffn_num", default=64, type=int)
    p.add_argument("--use_adapter", default=True, type=bool_flag)
    p.add_argument("--img_size", default=224, type=int)
    p.add_argument("--global_size", default=224, type=int)
    p.add_argument("--local_size", default=96, type=int)
    p.add_argument("--max_steps_per_epoch", default=None, type=int)
    p.add_argument("--crop_pack", default=1, type=int,
                   help="fold this many local crops into one student "
                        "sequence with a block-diagonal attention mask "
                        "(same math, bigger attention n — see "
                        "tools/profile_crop_packing.py); must divide "
                        "local_crops_number x batch")
    p.add_argument("--pack_mode", default="masked",
                   choices=["masked", "blocked"],
                   help="how packed sequences run attention: 'masked' = "
                        "one big attention with a block-diagonal mask "
                        "(fastest at pack=2 on v5e); 'blocked' = segments "
                        "fold into the attention batch dim (zero extra "
                        "attention FLOPs — for attention-FLOP-bound "
                        "operating points). Exact-math equal.")
    return p


def train_dino(args):
    from snuffy_tpu.utils.compile_cache import enable as _cc
    _cc()  # relay recompiles per process; the persistent cache works through it
    import jax
    import jax.numpy as jnp

    from snuffy_tpu.models.vit import vit_base, vit_small, vit_tiny
    from snuffy_tpu.parallel.ssl_sharding import (
        dp_mesh,
        replicate_state,
        shard_batch_global,
    )
    from snuffy_tpu.ssl.augment import dino_multicrop_batch
    from snuffy_tpu.ssl.data import ImageBatcher, list_image_folder
    from snuffy_tpu.ssl.dino import DINOTrainer
    from snuffy_tpu.ssl.schedules import cosine_iter_schedule
    from snuffy_tpu.embed import torch_import as ti

    # Data parallelism over every chip (all hosts): batch_size_per_gpu is
    # PER-DEVICE, exactly the reference's per-GPU contract under DDP
    # (reference main_dino_adapter.py:334 + utils.get_world_size()). One
    # device → plain single-chip path, zero sharding machinery.
    n_dev = jax.device_count()
    mesh = dp_mesh() if n_dev > 1 else None
    local_batch = args.batch_size_per_gpu * jax.local_device_count()

    factory = {"vit_tiny": vit_tiny, "vit_small": vit_small,
               "vit_base": vit_base}[args.arch]
    backbone = factory(
        patch_size=args.patch_size, output="cls",
        use_adapter=args.use_adapter, adapter_bottleneck=args.ffn_num,
        adapter_scale=args.adapter_ffn_scalar,
        drop_path_rate=args.drop_path_rate,
        compute_dtype=args.compute_dtype,
        pack_mode=getattr(args, "pack_mode", "masked"),
    )
    trainer = DINOTrainer(
        backbone,
        out_dim=args.out_dim,
        warmup_teacher_temp=args.warmup_teacher_temp,
        teacher_temp=args.teacher_temp,
        warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs,
        n_local_crops=args.local_crops_number,
        local_size=args.local_size,
        global_size=args.global_size,
        freeze_backbone=args.use_adapter,
        freeze_last_layer=args.freeze_last_layer,
        clip_grad=args.clip_grad,
        norm_last_layer=args.norm_last_layer,
        optimizer=args.optimizer,
        use_bn_in_head=args.use_bn_in_head,
        crop_pack=args.crop_pack,
    )
    state = trainer.init_state(args.seed)

    if args.full_checkpoint:
        parts = ti.load_torch_full_checkpoint(args.full_checkpoint)
        if parts:
            # Full training checkpoint: student + teacher, backbone + head
            # with shape filtering / --random_head (reference
            # main_dino_adapter.py:239-311).
            loaded = ti.import_dino_student_teacher(
                parts, state.student, state.teacher,
                random_head=bool(args.random_head),
            )
            student = loaded.get("student", state.student)
            teacher = loaded.get(
                "teacher", jax.tree_util.tree_map(jnp.copy, student)
            )
            state = state._replace(student=student, teacher=teacher)
        else:
            # Plain backbone weights (published DINO backbone .pth).
            sd = ti.load_torch_state_dict(args.full_checkpoint)
            imported = ti.import_vit(sd)
            merged = ti.merge_into(state.student["backbone"], imported)
            student = {"backbone": merged, "head": state.student["head"]}
            teacher = jax.tree_util.tree_map(jnp.copy, student)
            state = state._replace(student=student, teacher=teacher)
        print(f"loaded full checkpoint from {args.full_checkpoint}")

    paths, _ = list_image_folder(args.data_path)
    if jax.process_count() > 1:
        # hosts feed disjoint image subsets (DistributedSampler role)
        paths = paths[jax.process_index()::jax.process_count()]
    batcher = ImageBatcher(paths, local_batch, args.img_size,
                           args.num_workers, args.seed)
    valid_batcher = None
    if args.valid_data_path:
        vp, _ = list_image_folder(args.valid_data_path)
        if jax.process_count() > 1:
            vp = vp[jax.process_index()::jax.process_count()]
        valid_batcher = ImageBatcher(vp, local_batch,
                                     args.img_size, args.num_workers,
                                     args.seed + 1)
    iters = len(batcher)
    if args.max_steps_per_epoch:
        iters = min(iters, args.max_steps_per_epoch)
    # hosts must agree on the number of sharded steps per epoch, or the
    # host with one extra batch launches a collective its peers never join
    from snuffy_tpu.utils.metrics_sync import global_min_int

    iters = global_min_int(iters)
    n_val_batches = global_min_int(
        min(len(valid_batcher), 5) if valid_batcher is not None else 0
    )
    print(f"{len(paths)} images, {iters} iters/epoch, "
          f"{n_dev} device(s) x batch {args.batch_size_per_gpu}")

    # linear lr scaling by the GLOBAL batch (reference
    # main_dino_adapter.py: lr * batch_size_per_gpu * world_size / 256)
    lr_s = cosine_iter_schedule(
        args.lr * args.batch_size_per_gpu * n_dev / 256.0, args.min_lr,
        args.epochs, iters, warmup_epochs=args.warmup_epochs,
    )
    wd_s = cosine_iter_schedule(args.weight_decay, args.weight_decay_end,
                                args.epochs, iters)
    mom_s = cosine_iter_schedule(args.momentum_teacher, 1.0, args.epochs,
                                 iters)

    step = trainer.get_step()
    aug = jax.jit(
        lambda key, imgs: dino_multicrop_batch(
            key, imgs.astype(jnp.float32) / 255.0,
            n_local=args.local_crops_number,
            global_size=args.global_size, local_size=args.local_size,
        )
    )

    os.makedirs(args.output_dir, exist_ok=True)
    start_epoch = 0
    ckpt = os.path.join(args.output_dir, "checkpoint.msgpack")
    if os.path.exists(ckpt):
        # restart_from_checkpoint equivalent (reference
        # dino_adapter/utils.py:157-189): restore model + OPTIMIZER + BN
        # state + epoch — the reference restores the torch optimizer and
        # fp16 scaler too; dropping opt_state would silently reset the Adam
        # moments on every restart.
        from flax import serialization

        template = {
            "student": state.student, "teacher": state.teacher,
            "center": state.center, "step": state.step,
            "opt_state": state.opt_state, "bn_stats": state.bn_stats,
            "epoch": 0,
        }
        with open(ckpt, "rb") as f:
            blob = f.read()
        try:
            payload = serialization.from_bytes(template, blob)
            state = state._replace(
                student=payload["student"], teacher=payload["teacher"],
                center=payload["center"], step=payload["step"],
                opt_state=payload["opt_state"], bn_stats=payload["bn_stats"],
            )
        except (ValueError, KeyError):
            # pre-optimizer-state checkpoint layout: restore what it has,
            # warn that the Adam moments restart from zero
            legacy = {
                "student": state.student, "teacher": state.teacher,
                "center": state.center, "step": state.step, "epoch": 0,
            }
            payload = serialization.from_bytes(legacy, blob)
            state = state._replace(
                student=payload["student"], teacher=payload["teacher"],
                center=payload["center"], step=payload["step"],
            )
            print("WARNING: legacy checkpoint without optimizer state — "
                  "Adam moments reset to zero on this resume")
        start_epoch = int(payload["epoch"]) + 1
        print(f"resumed from {ckpt} at epoch {start_epoch}")
        # wandb-history-replay equivalent: keep each epoch's metrics exactly
        # once across restarts (reference main_dino_adapter.py:383-446).
        from snuffy_tpu.utils.logging import truncate_log_past_epoch

        truncate_log_past_epoch(
            os.path.join(args.output_dir, "log.txt"), start_epoch
        )

    if mesh is not None:
        # replicate student/teacher/opt state across the dp axis; the
        # jitted step's batch-mean grads then psum over ICI (the DDP
        # all-reduce of reference dino_adapter/utils.py:473-513), and the
        # DINOLoss center mean is the global-batch mean for free
        # (reference main_dino_adapter.py:666-668 dist.all_reduce).
        state = replicate_state(state, mesh)

    it = start_epoch * iters
    key = jax.random.PRNGKey(args.seed + start_epoch)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = []
        for bi, batch in enumerate(batcher.epoch()):
            if bi >= iters:
                break
            key, k_aug, k_step = jax.random.split(key, 3)
            imgs = (shard_batch_global(batch, mesh) if mesh is not None
                    else jnp.asarray(batch))
            g, l = aug(k_aug, imgs)
            state, loss = step(
                state, g, l,
                jnp.asarray(lr_s(it), jnp.float32),
                jnp.asarray(wd_s(it), jnp.float32),
                jnp.asarray(mom_s(it), jnp.float32),
                jnp.asarray(trainer.teacher_temp_at(epoch), jnp.float32),
                jnp.asarray(epoch < args.freeze_last_layer),
                k_step,
            )
            loss = float(np.asarray(loss))
            if not math.isfinite(loss):
                raise FloatingPointError(f"Loss is {loss}, stopping training")
            losses.append(loss)
            it += 1
        val_loss = None
        if valid_batcher is not None:
            vl = []
            for bi, batch in enumerate(valid_batcher.epoch()):
                if bi >= n_val_batches:
                    break
                key, k_aug = jax.random.split(key)
                imgs = (shard_batch_global(batch, mesh) if mesh is not None
                        else jnp.asarray(batch))
                g, l = aug(k_aug, imgs)
                vl.append(trainer.eval_loss(
                    state, g, l, trainer.teacher_temp_at(epoch)
                ))
            val_loss = float(np.mean(vl)) if vl else None

        row = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)) if losses else None,
            "val_loss": val_loss,
            "lr": lr_s(it - 1),
            "wd": wd_s(it - 1),
            "epoch_time_s": time.time() - t0,
        }
        # Multi-host: each process only saw its dcn-block's batches —
        # count-weight the epoch means across hosts so the logged losses
        # are global, then write from process 0 only (the reference's
        # MetricLogger.synchronize_between_processes + is_main_process
        # gating, dino_adapter/utils.py:229-405,449-465).
        from snuffy_tpu.utils.metrics_sync import sync_epoch_row

        row, is_writer = sync_epoch_row(row, len(losses))
        if not is_writer:
            continue  # state is replicated; process 0 writes for all
        print(json.dumps(row))
        with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(row) + "\n")
        _save(args, trainer, state, epoch)
    batcher.close()
    if valid_batcher is not None:
        valid_batcher.close()
    return state


def _save(args, trainer, state, epoch):
    from flax import serialization

    payload = {
        "student": state.student,
        "teacher": state.teacher,
        "center": state.center,
        "step": state.step,
        "opt_state": state.opt_state,
        "bn_stats": state.bn_stats,
        "epoch": epoch,
    }
    path = os.path.join(args.output_dir, "checkpoint.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    if args.saveckp_freq and epoch % args.saveckp_freq == 0:
        import shutil

        shutil.copy(path, os.path.join(args.output_dir,
                                       f"checkpoint{epoch:04}.msgpack"))


if __name__ == "__main__":
    train_dino(get_args_parser().parse_args())
