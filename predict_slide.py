"""Single-slide end-to-end inference CLI — the BASELINE.json north-star
path: WSI TIF → tiles (in memory) → embedder → Snuffy bag score, with a
per-stage timing breakdown. No JPEG/CSV intermediates touch disk.

Example:
  python predict_slide.py --slide datasets/camelyon16/1_tumor/tumor_001.tif \
      --embedder SimCLR --backbone resnet18 --embedder_weights w.pth \
      --aggregator_weights runs/camelyon16/run/best.msgpack
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Snuffy end-to-end slide inference")
    p.add_argument("--slide", required=True,
                   help="slide TIF path or glob (batch serving)")
    p.add_argument("--embedder", default="SimCLR", type=str)
    p.add_argument("--backbone", default="resnet18", type=str)
    p.add_argument("--embedder_weights", default=None, type=str)
    p.add_argument("--aggregator_weights", default=None, type=str)
    p.add_argument("--feats_size", default=512, type=int)
    p.add_argument("--num_classes", default=1, type=int)
    p.add_argument("--num_heads", default=4, type=int)
    p.add_argument("--big_lambda", default=200, type=int)
    p.add_argument("--random_patch_share", default=0.0, type=float)
    p.add_argument("--depth", default=1, type=int)
    p.add_argument("--tile_size", default=256, type=int)
    p.add_argument("--embed_size", default=224, type=int)
    p.add_argument("--embed_batch", default=256, type=int)
    p.add_argument("--background_t", default=15.0, type=float)
    p.add_argument("--objective", default=40.0, type=float)
    p.add_argument("--base_mag", default=20.0, type=float)
    p.add_argument("--workers", default=8, type=int)
    p.add_argument("--transform", default=0, type=int)
    p.add_argument("--bf16", default=1, type=int)
    p.add_argument("--prefetch", default=None, type=int, choices=[0, 1],
                   help="decode-prefetch thread in the streaming path: "
                        "unset = auto (on when the host has >1 core), "
                        "1/0 = force (see ROOFLINE.md §4)")
    p.add_argument("--scaled_decode", default=None, type=int, choices=[0, 1],
                   help="libjpeg M/8 scaled tile decode straight to "
                        "embed_size (JPEG-tiled slides whose "
                        "embed/tile ratio is M/8, e.g. 224/256 = 7/8): "
                        "unset/1 = auto when eligible, 0 = always decode "
                        "at tile_size + resize on device")
    return p


def main(argv=None):
    from snuffy_tpu.utils.compile_cache import enable as _cc
    _cc()  # relay recompiles per process; the persistent cache works through it
    args = get_args_parser().parse_args(argv)
    import jax

    from flax import serialization

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params
    from snuffy_tpu.pipeline.slide_inference import predict_slide
    from snuffy_tpu.tiling.deepzoom import TilerConfig

    import compute_feats as cf

    emb_args = argparse.Namespace(
        embedder=args.embedder, backbone=args.backbone,
        weights=args.embedder_weights, num_classes=args.num_classes,
        patch_size=16, use_adapter=False, ffn_num=64,
        adapter_ffn_scalar=4.0, norm_layer="instance",
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    embedder = cf.build_and_load_embedder(emb_args)
    embed_fn = embedder.jit_apply()

    cfg = SnuffyModelConfig(
        feats_size=args.feats_size, num_classes=args.num_classes,
        num_heads=args.num_heads, big_lambda=args.big_lambda,
        random_patch_share=args.random_patch_share, depth=args.depth,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    model = build_milnet(cfg)
    params = init_milnet_params(cfg, 0, n_example=64)
    if args.aggregator_weights:
        with open(args.aggregator_weights, "rb") as f:
            payload = serialization.from_bytes(
                {"params": params, "w": np.float32(0.5),
                 "step": np.int32(0)},
                f.read(),
            )
        params = payload["params"]

    @jax.jit
    def milnet_apply(p, feats, mask):
        ins_logits, bag_logits, _ = model.apply(
            {"params": p}, feats, mask, True,
            rngs={"sparse": jax.random.PRNGKey(0)},
        )
        return jax.nn.sigmoid(ins_logits[:, 0]), jax.nn.sigmoid(bag_logits[0])

    tiler_cfg = TilerConfig(
        tile_size=args.tile_size,
        background_threshold=args.background_t,
        objective_power=args.objective,
        base_mag=args.base_mag,
    )
    import glob as globlib

    slides = sorted(globlib.glob(args.slide)) or [args.slide]
    preds = []
    for slide_path in slides:
        pred = predict_slide(
            slide_path, embed_fn, embedder.params, embedder.head_params,
            milnet_apply, params,
            tiler_cfg=tiler_cfg,
            embed_batch=args.embed_batch,
            embed_size=args.embed_size,
            imagenet_norm=bool(args.transform),
            workers=args.workers,
            prefetch=None if args.prefetch is None else bool(args.prefetch),
            scaled_decode=(None if args.scaled_decode is None
                           else bool(args.scaled_decode)),
        )
        print(json.dumps({
            "slide": slide_path,
            "bag_score": pred.bag_score,
            **pred.timings,
        }))
        preds.append(pred)
    return preds if len(preds) > 1 else preds[0]


if __name__ == "__main__":
    main()
