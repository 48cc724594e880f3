"""Patient-aware 4-fold TCGA split → folds/fold_{i}.csv (counterpart of the
reference datasets/tcga/fold_generator.py)."""

import argparse

from snuffy_tpu.data.splits import tcga_patient_folds

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--patient_csv", default="single/patients.csv")
    p.add_argument("--out_dir", default="./folds/")
    p.add_argument("--n_splits", default=4, type=int)
    p.add_argument("--val_size", default=0.2, type=float)
    p.add_argument("--seed", default=42, type=int)
    args = p.parse_args()
    paths = tcga_patient_folds(args.patient_csv, args.out_dir, args.n_splits,
                               args.val_size, args.seed)
    print(f"Done. Wrote {paths}")
