"""Build the k-fold MIL pickle from an SVM-format dataset file (counterpart
of the reference datasets/mil_dataset/mil_cross_validation.py: parse →
admissible shuffle (both classes in every fold's every split) → pickle)."""

import argparse

import numpy as np

from snuffy_tpu.data.mil_pickle import build_mil_pickle

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="musk1",
                   choices=["musk1", "musk2", "elephant", "fox", "tiger"])
    p.add_argument("--num_folds", default=10, type=int)
    p.add_argument("--valid_ratio", default=0.2, type=float)
    p.add_argument("--base_path", default="./")
    p.add_argument("--seed", default=None, type=int)
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    out = build_mil_pickle(args.dataset, args.num_folds, args.valid_ratio,
                           args.base_path, rng=rng)
    print(f"Done. Wrote {out}")
