"""Split tiled CAMELYON16 slides into single/fold1/{train,validation,test}
(counterpart of the reference script of the same name). Run from
datasets/camelyon16/ with reference.csv and single/ present."""

import argparse

from snuffy_tpu.data.splits import apply_split, camelyon16_split_slides

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="reference.csv")
    p.add_argument("--base_dir", default="single")
    p.add_argument("--fold", default=1, type=int)
    p.add_argument("--val_size", default=0.2, type=float)
    p.add_argument("--seed", default=42, type=int)
    args = p.parse_args()

    split = camelyon16_split_slides(args.reference, args.val_size, args.seed)
    df = apply_split(args.base_dir, split, fold=args.fold)
    print(f"Done. {len(df)} slides split; see fold{args.fold}.csv")
