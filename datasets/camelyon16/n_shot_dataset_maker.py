"""Sample ≤N patches per slide into single/fold1_{N}shot (counterpart of
the reference n_shot_dataset_maker.py)."""

import argparse

from snuffy_tpu.data.splits import n_shot_subset

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="single/fold1/train")
    p.add_argument("--dst", default=None)
    p.add_argument("--num_files", default=5, type=int)
    p.add_argument("--seed", default=None, type=int)
    args = p.parse_args()
    dst = args.dst or f"{args.src}_{args.num_files}shot"
    total = n_shot_subset(args.src, dst, args.num_files, args.seed)
    print(f"Done. {total} patches copied to {dst}.")
