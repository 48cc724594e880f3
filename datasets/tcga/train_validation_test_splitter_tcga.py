"""Apply a generated TCGA fold CSV to the tiled single/ tree (counterpart
of the reference train_validation_test_splitter_tcga.py)."""

import argparse

from snuffy_tpu.data.splits import apply_split, split_from_fold_csv

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--fold_csv", default="folds/fold_0.csv")
    p.add_argument("--base_dir", default="single")
    p.add_argument("--fold", default=1, type=int)
    p.add_argument("--classes", nargs="+", default=["0_luad", "1_lusc"])
    args = p.parse_args()
    split = split_from_fold_csv(args.fold_csv)
    df = apply_split(args.base_dir, split, classes=args.classes,
                     fold=args.fold)
    print(f"Done. {len(df)} slides split.")
