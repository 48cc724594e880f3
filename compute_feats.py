"""WSI patch feature extraction CLI — drop-in for the reference's
`python compute_feats.py ...` (reference compute_feats.py:269-309 flags).

Pipeline: patch JPEG bags under `datasets/<dataset>/single/<fold>` → frozen
embedder forward (SimCLR ResNet-18 / DINO ViT ± adapter / MAE ViT) →
embeddings CSVs under `embeddings/<dataset>/<embedder><version>/...` plus
the dataset-level `[path, label]` CSV the MIL trainer consumes.

TPU-native: one static-shape jitted batch program; host JPEG decode in a
process pool; checkpoint import from published PyTorch `.pth` files.
"""

from __future__ import annotations

import argparse
import os
import warnings


def get_args_parser():
    parser = argparse.ArgumentParser(description="WSI Patch Embedder")
    parser.add_argument("--embedder", default="SimCLR", type=str,
                        choices=["SimCLR", "DINO", "MAE"])
    parser.add_argument("--num_classes", default=2, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--num_workers", default=8, type=int)
    parser.add_argument("--gpu_index", type=int, nargs="+", default=(0,))
    parser.add_argument("--backbone", default="resnet18", type=str,
                        choices=["resnet18", "vit_small", "vit_base",
                                 "mae_vit_base_patch16",
                                 "mae_vit_large_patch16"])
    parser.add_argument("--norm_layer", default="instance", type=str,
                        choices=["instance", "batch"])
    parser.add_argument("--weights", default=None, type=str,
                        help="path to pretrained embedder weights (.pth)")
    parser.add_argument("--version_name", default="", type=str)
    parser.add_argument("--dataset", default="camelyon16", type=str)
    parser.add_argument("--fold", default="fold1", type=str)
    parser.add_argument("--num_processes", default=1, type=int)
    parser.add_argument("--adapter_ffn_scalar", default=4, type=float)
    parser.add_argument("--ffn_num", default=64, type=int)
    parser.add_argument("--drop_path_rate", default=0.0, type=float)
    parser.add_argument("--patch_size", default=16, type=int)
    parser.add_argument("--use_adapter", default=False, action="store_true")
    parser.add_argument("--compute_dtype", default="bfloat16", type=str,
                        choices=["float32", "bfloat16"],
                        help="ViT matmul dtype on device; bf16 is the "
                             "TPU-native fast path (embeddings emit f32)")
    parser.add_argument("--transform", default=0, type=int,
                        help="1 → ImageNet normalization")
    parser.add_argument("--droped", default=0, type=int,
                        help="non-zero skips writing the [bag_path,label] "
                             "CSV tree (reference compute_feats.py:573)")
    parser.add_argument("--norm_pix_loss", default=0)
    parser.add_argument("--datasets_path", default="datasets", type=str)
    parser.add_argument("--embeddings_path", default="embeddings", type=str)
    return parser


def validate_args(args):
    if args.norm_layer == "instance" and "simclr" not in args.embedder.lower():
        warnings.warn(
            "norm_layer=instance is the DSMIL-SimCLR convention; check that "
            "your pretrained model used InstanceNorm2d too"
        )


def build_and_load_embedder(args):
    from snuffy_tpu.embed.registry import build_embedder
    from snuffy_tpu.embed import torch_import as ti

    embedder = build_embedder(
        embedder=args.embedder,
        backbone=args.backbone,
        num_classes=args.num_classes,
        patch_size=args.patch_size,
        use_adapter=args.use_adapter,
        adapter_ffn_num=args.ffn_num,
        adapter_ffn_scalar=args.adapter_ffn_scalar,
        norm_layer=args.norm_layer,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
    )
    if args.weights:
        sd = ti.load_torch_state_dict(args.weights)
        if args.backbone == "resnet18":
            imported = ti.import_resnet18(sd, args.norm_layer)
        elif args.embedder.upper() == "MAE":
            imported = ti.import_mae(sd)
        else:
            imported = ti.import_vit(sd)
        matched, mismatched = ti.check_layers(imported, embedder.params)
        from snuffy_tpu.utils.tables import print_layer_audit

        print_layer_audit(matched, mismatched)
        embedder.params = ti.merge_into(embedder.params, imported)
    return embedder


def main(argv=None):
    from snuffy_tpu.utils.compile_cache import enable as _cc
    _cc()  # relay recompiles per process; the persistent cache works through it
    args = get_args_parser().parse_args(argv)
    validate_args(args)
    from snuffy_tpu.embed.pipeline import (
        extract_dataset,
        save_class_features,
        write_dataset_csv,
    )

    embedder = build_and_load_embedder(args)

    dataset_path = os.path.join(args.datasets_path, args.dataset)
    version = f"{args.embedder}{('_' + args.version_name) if args.version_name else ''}"
    out_dir = os.path.join(args.embeddings_path, args.dataset, version)

    tile_label_csv = os.path.join(dataset_path, "tile_label.csv")
    if not os.path.exists(tile_label_csv):
        tile_label_csv = None

    # Class subdirectories of single/<fold>/<split> map to integer labels
    # in sorted order (reference compute_feats.py:596-616).
    fold_root = os.path.join(dataset_path, "single", args.fold)
    class_names = sorted(
        d for d in os.listdir(fold_root)
        if os.path.isdir(os.path.join(fold_root, d))
    ) if os.path.isdir(fold_root) else []
    # splits (train/valid/test) may nest classes one level deeper
    if class_names and set(class_names) & {"train", "valid", "test"}:
        nested = set()
        for split in class_names:
            split_dir = os.path.join(fold_root, split)
            nested.update(
                d for d in os.listdir(split_dir)
                if os.path.isdir(os.path.join(split_dir, d))
            )
        class_labels = {c: i for i, c in enumerate(sorted(nested))}
    else:
        class_labels = {c: i for i, c in enumerate(class_names)}
    print(f"class labels: {class_labels}")

    # Save the "cleaned" embedder next to the embeddings (the reference's
    # remapped-weights save, compute_feats.py:486-490) so roi.py /
    # predict_slide.py reload exactly what produced these features.
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "embedder.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            {"params": embedder.params, "head": embedder.head_params}
        ))

    rows = extract_dataset(
        embedder,
        dataset_path,
        args.fold,
        out_dir,
        class_labels=class_labels,
        tile_label_csv=tile_label_csv,
        batch_size=args.batch_size,
        imagenet_norm=bool(args.transform),
        num_workers=args.num_workers if args.num_workers > 0 else 0,
    )
    # Full artifact tree: per-split per-class CSVs + shuffled dataset CSV,
    # gated on --droped (reference compute_feats.py:548-587). Fold layouts
    # without split/class nesting fall back to the flat dataset CSV.
    # Multi-host: ALL hosts must finish their bag shards before anyone
    # globs the tree, and only process 0 writes it (otherwise the dataset
    # CSV captures a mid-extraction partial view / races on shared FS).
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("compute_feats_extract_done")
        if jax.process_index() != 0:
            print(f"extracted {len(rows)} bags (host shard) → {out_dir}")
            return rows
    all_df = save_class_features(out_dir, f"{args.dataset}.csv",
                                 droped=args.droped, seed=0)
    if all_df is None and args.droped == 0:
        if jax.process_count() > 1:
            # each host's `rows` covers only its bag shard; the flat
            # fallback rebuilds the full row list from the shared tree
            import glob as _glob

            rows = sorted(
                (p, (class_labels or {}).get(
                    os.path.basename(os.path.dirname(p)), 0))
                for p in _glob.glob(os.path.join(out_dir, "**", "*.csv"),
                                    recursive=True)
                if os.path.basename(p) != f"{args.dataset}.csv"
            )
        write_dataset_csv(os.path.join(out_dir, f"{args.dataset}.csv"), rows)
    print(f"extracted {len(rows)} bags → {out_dir}")
    return rows


if __name__ == "__main__":
    main()
