"""MIL training CLI — drop-in for the reference's `python train.py ...`.

Flag surface mirrors reference train.py:54-135 (same names/defaults,
including the literal-eval'd composite sweep flags); the runtime underneath
is the TPU-native stack in snuffy_tpu/ (bucketed lax.scan epochs, msgpack
checkpoints, JSONL metrics instead of wandb).

Examples (reference README.md:604-696 recipes work verbatim):
  python train.py --dataset=musk1 --arch=snuffy --num_heads=2 ...
  python train.py --dataset=camelyon16 --embedding=dino_vits --arch=snuffy \
      --big_lambda=500 --random_patch_share=0.5 --lr=0.02 --optimizer=adamw
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd


def get_args_parser():
    parser = argparse.ArgumentParser(
        description="Train MIL models on patch features (TPU-native Snuffy)"
    )
    parser.add_argument("--num_classes", default=1, type=int)
    parser.add_argument("--feats_size", default=512, type=int)
    parser.add_argument("--lr", default=2e-4, type=float)
    parser.add_argument("--num_epochs", default=200, type=int)
    parser.add_argument("--gpu_index", type=int, nargs="+", default=(0,),
                        help="accepted for compatibility; devices come from jax")
    parser.add_argument("--weight_decay", default=5e-3, type=float)
    parser.add_argument("--eta_min", default=5e-6, type=float)
    parser.add_argument("--dataset", default="camelyon16", type=str)
    parser.add_argument("--embedding", default="SimCLR", type=str)
    parser.add_argument("--split", default=0.2, type=float)
    parser.add_argument("--dropout_patch", default=0, type=float)
    parser.add_argument(
        "--weight_init__weight_init_i__weight_init_b",
        default="['xavier_normal', 'xavier_normal', 'xavier_normal']",
    )
    parser.add_argument("--optimizer", default="adam", type=str,
                        choices=["adam", "adamw"])
    parser.add_argument("--scheduler", default="cosine", type=str,
                        choices=["cosinewarmup", "cosine"])
    parser.add_argument("--num_processes", default=8, type=int)
    parser.add_argument("--wandb_run", default=None)
    parser.add_argument("--use_mp", default=1, choices=[0, 1], type=int)
    parser.add_argument("--arch", default="snuffy", type=str)
    parser.add_argument("--bins", default=10, type=int)
    # MIL datasets (Musk1, Musk2, Elephant)
    parser.add_argument("--cv_num_folds", default=10, type=int)
    parser.add_argument("--cv_current_fold", default=0, type=int)
    parser.add_argument("--cv_valid_ratio", default=0.2, type=float)
    # SmallWeight
    parser.add_argument("--soft_average", default=0, choices=[0, 1], type=int)
    parser.add_argument("--single_weight__lr_multiplier", default=0.1, type=float)
    # Snuffy
    parser.add_argument("--num_heads", default=6, type=int)
    parser.add_argument("--big_lambda", default=200, type=int, help="top k")
    parser.add_argument("--random_patch_share", default=0.0, type=float)
    parser.add_argument("--mlp_multiplier", default=4, type=int)
    parser.add_argument("--encoder_dropout", default=0.0, type=float)
    parser.add_argument("--activation", default="relu", type=str)
    parser.add_argument("--clip_grad", default=None, type=float)
    parser.add_argument("--depth", default=1, type=int)
    parser.add_argument("--betas", default="[0.5, 0.9]")
    # ROC dumps
    parser.add_argument("--roc_run_name", type=str, default=None)
    parser.add_argument("--roc_run_epoch", type=int, default=None)
    parser.add_argument("--roc_data_split", default="test", type=str,
                        choices=["train", "valid", "test"])
    parser.add_argument("--l2normed_embeddings", default=0, type=int)
    parser.add_argument("--seed", default=1, type=int)
    # TPU-native extras
    parser.add_argument("--use_pallas", default=1, choices=[0, 1], type=int,
                        help="use the fused Pallas sparse-attention kernel")
    parser.add_argument("--bag_batch_size", default=1, type=int,
                        help="bags per optimizer step (1 = reference serial"
                             " semantics; >1 = batched grads for throughput)")
    parser.add_argument("--bag_batch_impl", default="packed",
                        choices=["packed", "vmap"],
                        help="batched-step layout (single device): packed "
                             "folds the batch along the row axis (M=B*N "
                             "GEMMs — fastest); vmap maps the per-bag graph")
    parser.add_argument("--use_mesh", default=None, type=int,
                        choices=[0, 1],
                        help="multi-chip MIL training (bag_batch_size>1): "
                             "unset = auto dp over all chips when the batch "
                             "divides; 1 = full dp*sp*tp mesh; 0 = one chip")
    parser.add_argument("--remat", default=0, choices=[0, 1], type=int,
                        help="rematerialize encoder layers in backward "
                             "(jax.checkpoint): ~1/3 more FLOPs for "
                             "O(depth) less activation HBM — ultra-long "
                             "bags on one chip")
    return parser


def build_config(args):
    from snuffy_tpu.configs import (
        MILTrainConfig,
        OptimizerConfig,
        SnuffyModelConfig,
        parse_literal_flag,
        resolve_feats_size,
    )

    inits = parse_literal_flag(args.weight_init__weight_init_i__weight_init_b)
    betas = parse_literal_flag(args.betas)
    feats_size = resolve_feats_size(args.dataset, args.feats_size)

    model = SnuffyModelConfig(
        feats_size=feats_size,
        num_classes=args.num_classes,
        num_heads=args.num_heads,
        big_lambda=args.big_lambda,
        random_patch_share=args.random_patch_share,
        mlp_multiplier=args.mlp_multiplier,
        encoder_dropout=args.encoder_dropout,
        activation=args.activation,
        depth=args.depth,
        multiclass=(args.arch == "snuffy_multiclass"),
        weight_init_i=inits[1],
        weight_init_b=inits[2],
        use_pallas=bool(args.use_pallas),
        remat=bool(args.remat),
    )
    optim = OptimizerConfig(
        optimizer=args.optimizer,
        lr=args.lr,
        betas=tuple(betas),
        weight_decay=args.weight_decay,
        eta_min=args.eta_min,
        scheduler=args.scheduler,
        clip_grad=args.clip_grad,
        single_weight_lr_multiplier=args.single_weight__lr_multiplier,
    )
    return MILTrainConfig(
        model=model,
        optim=optim,
        num_epochs=args.num_epochs,
        dataset=args.dataset,
        embedding=args.embedding,
        split=args.split,
        dropout_patch=args.dropout_patch,
        l2normed_embeddings=bool(args.l2normed_embeddings),
        soft_average=bool(args.soft_average),
        num_processes=args.num_processes,
        use_mp=bool(args.use_mp),
        bins=args.bins,
        seed=args.seed,
        arch=args.arch,
        cv_num_folds=args.cv_num_folds,
        cv_current_fold=args.cv_current_fold,
        cv_valid_ratio=args.cv_valid_ratio,
        run_name=args.wandb_run,
        roc_run_name=args.roc_run_name,
        roc_run_epoch=args.roc_run_epoch,
        roc_data_split=args.roc_data_split,
        bag_batch_size=args.bag_batch_size,
        bag_batch_impl=args.bag_batch_impl,
        use_mesh=args.use_mesh,
    )


def load_datasets(cfg):
    """(train, valid, test) bag tuples per the reference's source layout
    (reference train.py:529-602)."""
    from snuffy_tpu.configs import HISTOPATHOLOGY_DATASETS, MIL_DATASETS
    from snuffy_tpu.data.bags import load_split
    from snuffy_tpu.data.mil_pickle import load_mil_data

    if cfg.dataset in MIL_DATASETS:
        return load_mil_data(
            cfg.dataset,
            cfg.model.feats_size,
            cfg.cv_num_folds,
            cfg.cv_current_fold,
            cfg.cv_valid_ratio,
        )
    if cfg.dataset not in HISTOPATHOLOGY_DATASETS:
        raise SystemExit(f"Unknown dataset {cfg.dataset}")

    if cfg.embedding == "official":
        bags_csv = os.path.join(
            cfg.embeddings_path, cfg.dataset, "official",
            f"{cfg.dataset.capitalize()}.csv",
        )
        bags_df = pd.read_csv(bags_csv)
        n_train = int(len(bags_df) * (1 - cfg.split))
        rest = bags_df.iloc[n_train:]
        splits = (
            bags_df.iloc[:n_train],
            rest.iloc[: len(rest) // 2],
            rest.iloc[len(rest) // 2:],
        )
    else:
        prefix = os.path.join(".", cfg.embeddings_path, cfg.dataset, cfg.embedding)
        bags_df = pd.read_csv(os.path.join(prefix, f"{cfg.dataset}.csv"))
        col = bags_df.columns[0]
        # Path-normalized prefix filter (reference train.py:586-593 —
        # 'valid' is a deliberate prefix of the 'validation' folder).
        paths_abs = bags_df[col].map(os.path.abspath)
        prefix_abs = os.path.abspath(prefix)
        splits = tuple(
            bags_df[paths_abs.str.startswith(
                os.path.join(prefix_abs, name)
            )]
            for name in ("train", "valid", "test")
        )

    out = []
    for df in splits:
        data = load_split(
            df.reset_index(drop=True),
            cfg.model.num_classes,
            num_processes=cfg.num_processes,
            use_mp=cfg.use_mp,
            seed=cfg.seed,
        )
        out.append(
            (data.labels, data.feats, data.feats_labels, data.positions,
             data.slide_names)
        )
    return tuple(out)


def main(argv=None):
    from snuffy_tpu.utils.compile_cache import enable as _cc
    _cc()  # relay recompiles per process; the persistent cache works through it
    args = get_args_parser().parse_args(argv)
    cfg = build_config(args)

    from snuffy_tpu.train.runner import Runner
    from snuffy_tpu.train.schedules import make_epoch_schedule
    from snuffy_tpu.train.trainer import SnuffyTrainer
    from snuffy_tpu.utils.logging import MetricsLogger

    if cfg.arch not in ("snuffy", "snuffy_multiclass"):
        raise SystemExit(
            f"Architecture not found. Given: {cfg.arch}, "
            f"Have: ['snuffy', 'snuffy_multiclass']"
        )

    train_data, valid_data, test_data = load_datasets(cfg)
    print(
        f"Num Bags (Train: {len(train_data[0])}) "
        f"(Valid: {len(valid_data[0])}) (Test: {len(test_data[0])})"
    )

    from snuffy_tpu.configs import replace as cfg_replace

    if cfg.run_name is None:
        cfg = cfg_replace(cfg, run_name=f"{cfg.arch}_seed{cfg.seed}")
    trainer = SnuffyTrainer(cfg)
    logger = MetricsLogger(
        path=os.path.join(cfg.save_path, cfg.dataset, cfg.run_name, "metrics.jsonl")
    )
    runner = Runner(cfg, trainer, train_data, valid_data, test_data, logger)
    schedule = make_epoch_schedule(
        cfg.optim.scheduler, cfg.optim.lr, cfg.num_epochs, cfg.optim.eta_min
    )
    summary = runner.run(schedule)
    print(
        f"best epoch {summary['best_epoch']} "
        f"valid AUC {summary['best_valid_auc']:.4f}"
    )
    return summary


if __name__ == "__main__":
    main()
