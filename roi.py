"""ROI heatmap inference CLI — counterpart of the reference's
`python roi.py` (reference roi.py:121-378; SURVEY.md §3.5):
embed every patch of the requested slides, run the Snuffy aggregator, and
overlay the instance-score heatmap on the slide thumbnail with the tumor
contour.

Differences: embedder + aggregator checkpoints are this framework's
formats (torch `.pth` imports for the embedder via compute_feats'
importers; msgpack for the aggregator), and the WSI/mask reads go through
the native libtiff reader instead of OpenSlide/ASAP.

Deliberately omitted: the reference's `--use_softmax_one` flag. In the
reference it is forwarded into the *dropout* parameter slot of
`MultiHeadedAttention` (reference roi.py:327-329 passes it where
`c(dropout)` is expected) — a latent bug: it never selects softmax-one
attention, it silently sets dropout to a bool. Since the reference's
snuffy.py has no softmax-one implementation either, the flag is a no-op
with misleading semantics and is not reproduced here.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Snuffy ROI heatmaps (TPU-native)")
    p.add_argument("--embedder", default="SimCLR", type=str)
    p.add_argument("--backbone", default="resnet18", type=str)
    p.add_argument("--embedder_weights", default=None, type=str)
    p.add_argument("--aggregator_weights", required=True, type=str,
                   help="MIL run checkpoint (.msgpack from train.py)")
    p.add_argument("--num_classes", default=1, type=int)
    p.add_argument("--feats_size", default=512, type=int)
    p.add_argument("--num_heads", default=6, type=int)
    p.add_argument("--big_lambda", default=200, type=int)
    p.add_argument("--random_patch_share", default=0.0, type=float)
    p.add_argument("--depth", default=5, type=int)
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--bags_path", required=True,
                   help="glob of bag dirs, e.g. datasets/camelyon16/single/fold1/test/1_tumor/*")
    p.add_argument("--slides_path", default=None,
                   help="folder of original WSI TIFs for thumbnails")
    p.add_argument("--masks_path", default=None,
                   help="folder of {slide}_mask.tif files for contours")
    p.add_argument("--thumb_level", default=3, type=int)
    p.add_argument("--output", default="roi_output", type=str)
    return p


def main(argv=None):
    args = get_args_parser().parse_args(argv)
    import jax

    from flax import serialization

    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.data.bucketing import pad_bag
    from snuffy_tpu.embed.pipeline import compute_bag_feats, parse_position
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params
    from snuffy_tpu.viz.heatmap import visualize_attentions

    import compute_feats as cf

    emb_args = argparse.Namespace(
        embedder=args.embedder, backbone=args.backbone,
        weights=args.embedder_weights, num_classes=args.num_classes,
        patch_size=16, use_adapter=False, ffn_num=64,
        adapter_ffn_scalar=4.0, norm_layer="instance",
        compute_dtype="float32",
    )
    embedder = cf.build_and_load_embedder(emb_args)
    embed_fn = embedder.jit_apply()

    cfg = SnuffyModelConfig(
        feats_size=args.feats_size, num_classes=args.num_classes,
        num_heads=args.num_heads, big_lambda=args.big_lambda,
        random_patch_share=args.random_patch_share, depth=args.depth,
    )
    model = build_milnet(cfg)
    template = init_milnet_params(cfg, 0, n_example=64)
    with open(args.aggregator_weights, "rb") as f:
        payload = serialization.from_bytes(
            {"params": template, "w": np.float32(0.5), "step": np.int32(0)},
            f.read(),
        )
    params = payload["params"]

    bag_dirs = sorted(d for d in glob.glob(args.bags_path) if os.path.isdir(d))
    print(f"{len(bag_dirs)} bags")
    for bag_dir in bag_dirs:
        slide = os.path.basename(bag_dir)
        patches = sorted(
            glob.glob(os.path.join(bag_dir, "*.jpg"))
            + glob.glob(os.path.join(bag_dir, "*.jpeg"))
        )
        if not patches:
            continue
        feats = compute_bag_feats(
            embed_fn, embedder.params, embedder.head_params, patches,
            args.batch_size,
        )
        padded, mask = pad_bag(feats.astype(np.float32))
        import jax.numpy as jnp

        ins_logits, bag_logits, _ = model.apply(
            {"params": params}, jnp.asarray(padded), jnp.asarray(mask), True,
            rngs={"sparse": jax.random.PRNGKey(0)},
        )
        scores = np.asarray(jax.nn.sigmoid(ins_logits))[: len(patches), 0]
        positions = [parse_position(p) or "0_0" for p in patches]

        slide_gray = tumor_mask = None
        if args.slides_path:
            tif = os.path.join(args.slides_path, f"{slide}.tif")
            if os.path.exists(tif):
                from snuffy_tpu.native import NativeSlide

                with NativeSlide(tif) as s:
                    lvl = min(args.thumb_level, s.level_count - 1)
                    w, h = s.level_dimensions(lvl)
                    rgb = s.read_region(lvl, 0, 0, w, h)
                    slide_gray = rgb.mean(axis=-1).astype(np.uint8)
        if args.masks_path and slide_gray is not None:
            mtif = os.path.join(args.masks_path, f"{slide}_mask.tif")
            if os.path.exists(mtif):
                from snuffy_tpu.native import NativeSlide

                with NativeSlide(mtif) as s:
                    lvl = min(args.thumb_level, s.level_count - 1)
                    w, h = s.level_dimensions(lvl)
                    lab = s.read_label_region(lvl, 0, 0, w, h)
                    import cv2

                    tumor_mask = cv2.resize(
                        (lab == 2).astype(np.uint8),
                        (slide_gray.shape[1], slide_gray.shape[0]),
                        interpolation=cv2.INTER_NEAREST,
                    )

        out_path = os.path.join(args.output, f"{slide}.png")
        visualize_attentions(scores, positions, out_path, slide_gray,
                             tumor_mask)
        print(f"{slide}: bag score {float(jax.nn.sigmoid(bag_logits)[0]):.3f}"
              f" → {out_path}")
    return bag_dirs


if __name__ == "__main__":
    main()
