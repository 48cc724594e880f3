"""Calibrate the hardened recipe-parity bags (VERDICT r2 next-6).

Sweeps the hardness knobs of make_wsi_scale_bags with OUR trainer (fast on
the chip) to find a setting where the recipe lands at AUC ~0.8-0.9 — i.e.
non-saturated, so the RUN_SLOW two-sided parity test can detect regressions
in either direction. Then run mode=ref on the chosen knobs to confirm the
torch reference loop lands in the same band (slow: ~10 min/seed on this
rig's single vCPU).

Usage:
  python tools/calibrate_recipe_bags.py mine     # knob sweep, our trainer
  python tools/calibrate_recipe_bags.py ref      # torch ref @ chosen knobs
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from test_training_parity_recipe import (  # noqa: E402
    make_wsi_scale_bags,
    train_mine_recipe,
    train_reference_recipe,
)

# candidate knob sets: (name, kwargs)
CANDIDATES = [
    ("blend.5_frac.5-2_dist1.5", dict(
        tumor_blend=0.5, tumor_frac_lo=0.005, tumor_frac_hi=0.02,
        distractor_frac=0.015, label_noise=0.1)),
    ("blend.65_frac.5-2_dist1.5", dict(
        tumor_blend=0.65, tumor_frac_lo=0.005, tumor_frac_hi=0.02,
        distractor_frac=0.015, label_noise=0.1)),
    ("blend.5_frac.3-1_dist1", dict(
        tumor_blend=0.5, tumor_frac_lo=0.003, tumor_frac_hi=0.01,
        distractor_frac=0.01, label_noise=0.1)),
]

CHOSEN = CANDIDATES[0][1]  # update after the sweep
SEEDS = (11, 12, 13)
GEN = dict(num_bags=44, n_lo=1024, n_hi=2560)


def split(labels, feats):
    return (labels[:12], feats[:12]), (labels[12:], feats[12:])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mine"
    if mode == "mine":
        for name, kw in CANDIDATES:
            aucs = []
            for seed in SEEDS:
                labels, feats = make_wsi_scale_bags(seed, **GEN, **kw)
                train_bags, test_bags = split(labels, feats)
                auc, w = train_mine_recipe(train_bags, test_bags, 1,
                                           seed=seed)
                aucs.append(auc)
                print(f"  {name} seed={seed}: auc={auc:.3f} w={w:.3f}",
                      flush=True)
            print(f"{name}: mean={sum(aucs) / len(aucs):.3f} {aucs}",
                  flush=True)
    else:
        for seed in SEEDS:
            labels, feats = make_wsi_scale_bags(seed, **GEN, **CHOSEN)
            train_bags, test_bags = split(labels, feats)
            auc, w = train_reference_recipe(train_bags, test_bags, seed=seed)
            print(f"ref seed={seed}: auc={auc:.3f} w={w:.3f}", flush=True)


if __name__ == "__main__":
    main()
