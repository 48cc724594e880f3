"""Undo the fold split: move slides back to single/<class>/ (counterpart of
the reference train_validation_test_reverse_camelyon.py)."""

import argparse

from snuffy_tpu.data.splits import reverse_split

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", default="single")
    p.add_argument("--fold", default=1, type=int)
    args = p.parse_args()
    moved = reverse_split(args.base_dir, fold=args.fold)
    print(f"Done. {moved} slides moved back.")
