"""Undo the TCGA fold split: move slides back to single/<class>/
(counterpart of the reference
datasets/tcga/train_validation_test_reverse_tcga.py — same walk over
fold<k>/{train,validation,test}/{0_luad,1_lusc}, delegating to the shared
reverse_split)."""

import argparse

from snuffy_tpu.data.splits import reverse_split

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", default="single")
    p.add_argument("--fold", default=1, type=int)
    args = p.parse_args()
    moved = reverse_split(
        args.base_dir, classes=("0_luad", "1_lusc"), fold=args.fold
    )
    print(f"Done. {moved} slides moved back.")
