"""Standalone CAMELYON16 FROC CLI — counterpart of the reference's
`python froc.py` entry (reference froc.py:350-394) without the ASAP
dependency: masks are read through snuffy_tpu.eval.froc's pluggable readers
(PIL multi-page TIFF by default).

Inputs: a reference CSV with columns [image, type], a masks folder with
`{image}_mask.tif`, and a detections folder with one `{image}.csv` per
slide, columns [p, x, y] at WSI level 0.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from snuffy_tpu.eval.froc import (
    EvalMaskCache,
    froc_for_slides,
    plot_froc,
    save_results,
)


def get_args_parser():
    p = argparse.ArgumentParser("CAMELYON16 FROC evaluation (ASAP-free)")
    p.add_argument("--reference", required=True,
                   help="CSV with columns [image, type]")
    p.add_argument("--masks", required=True, help="folder of {image}_mask.tif")
    p.add_argument("--detections", required=True,
                   help="folder of {image}.csv with columns [p, x, y]")
    p.add_argument("--result", default=None, help="output CSV path")
    p.add_argument("--plot", default=None, help="output FROC plot path")
    p.add_argument("--level", default=5, type=int,
                   help="evaluation mask level")
    p.add_argument("--include_itcs", action="store_true")
    p.add_argument("--cache_dir", default=None,
                   help="persist computed evaluation masks as npz here — "
                        "repeated sweeps against the same test masks skip "
                        "the distance-transform/labeling recompute (the "
                        "working version of the reference's vestigial "
                        "use_cache flag, froc.py:450-451)")
    return p


def main(argv=None):
    args = get_args_parser().parse_args(argv)
    ref = pd.read_csv(args.reference)

    detections, types = {}, {}
    for _, row in ref.iterrows():
        image = os.path.splitext(str(row["image"]))[0]
        det_csv = os.path.join(args.detections, f"{image}.csv")
        if not os.path.exists(det_csv):
            continue
        df = pd.read_csv(det_csv)
        detections[image] = [
            (float(r["p"]), float(r["x"]), float(r["y"]))
            for _, r in df.iterrows()
        ]
        types[image] = str(row["type"]).lower()

    def mask_for(slide):
        return os.path.join(args.masks, f"{slide}_mask.tif")

    cache = EvalMaskCache(args.cache_dir) if args.cache_dir else None
    score, avg_fps, sens = froc_for_slides(
        detections, mask_for, types,
        evaluation_mask_level=args.level,
        include_itcs=args.include_itcs,
        mask_cache=cache,
    )
    print(f"Score: {score}")
    if args.result:
        save_results(args.result, avg_fps, sens)
    if args.plot:
        plot_froc(avg_fps, sens, args.plot)
    return score


if __name__ == "__main__":
    main()
