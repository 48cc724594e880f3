"""Calibrate the hardened recipe-parity bags (VERDICT r2 next-6).

Sweeps the hardness knobs of make_wsi_scale_bags with OUR trainer to find
a setting where the recipe lands at AUC ~0.8-0.9 — non-saturated, so the
RUN_SLOW two-sided parity test can detect regressions in either
direction. Then run mode=ref on the chosen knobs to confirm the torch
reference loop lands in the same band (slow on this rig's single vCPU).

Compile economics on the relay (every jit of a new trainer recompiles):
ONE trainer is built and reused across all (candidate, seed) runs with
state re-inits, and the bag sizes span a single bucket, so the whole
sweep compiles exactly one train-scan + one eval program per scan length.

First sweep result (recorded): blend=0.5 frac=0.5-2% dist=1.5%
noise=0.1 → AUC 0.48-0.58 (chance — too hard at 12 train bags).

Usage:
  python tools/calibrate_recipe_bags.py mine     # knob sweep, our trainer
  python tools/calibrate_recipe_bags.py ref      # torch ref @ chosen knobs
"""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from test_training_parity_recipe import (  # noqa: E402
    GEN,
    N_TEST_FLIPS,
    N_TRAIN,
    RECIPE,
    _l2norm,
    flip_exact,
    make_wsi_scale_bags,
    train_reference_recipe,
)

# Sweep history — EVERY stochastic-hardness setting sits on a learning
# CLIFF with giant seed variance (this geometry's patch SNR is cos≈0.17
# at noise 0.3/d=384, so the max-instance loss is ruined by tiny
# distractor shares, and Bernoulli label noise at ≤16 train bags swings
# whole runs):
#   12 train bags, n 1300-2040:
#     blend.5 frac.5-2 dist1.5@.5 ln.1  → 0.48/0.58   (chance)
#     blend.35 frac1.5-3.5 dist1@.25    → 0.73/0.54
#   16 train bags, n 640-1000:
#     blend.3 frac2-4 dist1@.25 ln.05   → 0.51/0.71/0.69
#     blend.3 frac1.5-3.5 dist1.5@.25   → 0.63/0.61/0.54
#     blend.2 frac2-4 dist1@.2 ln.05    → 0.50/0.72/0.71
# Conclusion: target the 0.8-0.9 band with a VARIANCE-FREE mechanism —
# keep the geometry stably learnable (mild blend, no distractors, no
# train noise) and flip an EXACT count of test labels (6/48 → AUC
# ceiling ≈0.875 for a perfect ranker, identical for both frameworks).
# J/K/L results: at n 640-1000 the task is unstable at ANY signal level
# (J frac2.5-4: 0.59/0.78/0.78; L frac3-5: 0.58-0.71 across 5 seeds,
# non-monotone in signal). The stable regime round 2 proved is BIGGER
# bags (n>=1536, ~4% fixed tumor, no blend → AUC 1.000). Final design:
# that geometry at n 1300-2040 (single 2048 bucket) + exact test flips
# for the variance-free ceiling.
CANDIDATES = [
    ("M easy_frac4_flip6", dict(
        tumor_blend=0.0, tumor_frac_lo=0.04, tumor_frac_hi=0.04)),
    ("N blend.15_frac4_flip6", dict(
        tumor_blend=0.15, tumor_frac_lo=0.04, tumor_frac_hi=0.04)),
]

# Measured @ n 1300-2040 (GEN), ceiling 0.875:
#   recipe lr=0.02: ours seeds 11/12 → 0.845/0.844, 13 → 0.47; seeds
#     14-17 → 0.807/0.806/0.774/0.601. Torch ref: 0.525/0.598 (seeds
#     11/12), and 0.468-0.821 across three torch INIT seeds on identical
#     bags; round-2's exact bags re-measured 0.875 → 0.688. BOTH sides
#     bimodal — the single-vCPU BLAS chaotic regime (CLAUDE.md).
#   STABLE_LR=5e-3: ours seeds 13-17 → 0.832/0.818/0.847/0.804/0.781
#     (mean 0.816, blend 0.15 indistinguishable) — stable; torch ref
#     seeds 13-15 → 0.811/0.854/0.885 (mean 0.850). Per-seed |diff|
#     ≤ 0.038. The two-sided parity band lives here
#     (tests/test_training_parity_recipe.py).
CHOSEN = CANDIDATES[0][1]
SEEDS = (13, 14, 15, 16, 17)   # mine: wide scan; ref (10 min/seed): the
REF_SEEDS = (13, 14, 15)       # test's three seeds only


def split(labels, feats, seed):
    # flip_exact comes from the test module — single source of truth
    te_labels = flip_exact(labels[N_TRAIN:], N_TEST_FLIPS, seed)
    return (labels[:N_TRAIN], feats[:N_TRAIN]), (te_labels,
                                                 feats[N_TRAIN:])


def run_mine(trainer, train_bags, test_bags, seed, lr=None):
    from sklearn.metrics import roc_auc_score

    from snuffy_tpu.train.runner import bucket_bags, compute_pos_weight
    from snuffy_tpu.train.schedules import cosine_annealing

    r = RECIPE
    tr_labels = [np.atleast_1d(np.asarray(l, np.float32))
                 for l in train_bags[0]]
    trainer.pos_weight = compute_pos_weight(train_bags[0])
    state = trainer.init_state(seed)
    sched = cosine_annealing(lr or r["lr"], r["epochs"], 0.0)
    host = np.random.default_rng(seed)
    tr_feats = [_l2norm(f) for f in train_bags[1]]
    for epoch in range(r["epochs"]):
        bucketed = bucket_bags(tr_labels, tr_feats, rng=host)
        state, *_ = trainer.run_train_epoch(
            state, bucketed, sched(epoch), host, seed
        )
    te_labels = [np.atleast_1d(np.asarray(l, np.float32))
                 for l in test_bags[0]]
    bucketed = bucket_bags(te_labels, [_l2norm(f) for f in test_bags[1]],
                           rng=host)
    _, scores, _, order = trainer.run_eval_epoch(state, bucketed, seed)
    y_true = np.asarray(test_bags[0])[order]
    return roc_auc_score(y_true, scores[:, 0]), float(state.w)


def build_trainer():
    from snuffy_tpu.configs import (
        MILTrainConfig, OptimizerConfig, SnuffyModelConfig,
    )
    from snuffy_tpu.train.trainer import SnuffyTrainer

    r = RECIPE
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=r["d"], num_classes=1, num_heads=r["heads"],
            big_lambda=r["lam"], random_patch_share=r["rho"],
            encoder_dropout=r["encoder_dropout"], activation=r["activation"],
            depth=r["depth"], multiclass=False,
            weight_init_i="xavier_uniform", weight_init_b="trunc_normal",
            use_pallas=False,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=r["lr"],
                              weight_decay=r["wd"], betas=r["betas"]),
        soft_average=True,
        dataset="camelyon16",
    )
    return SnuffyTrainer(cfg)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mine"
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else None
    if mode == "mine":
        trainer = build_trainer()
        for name, kw in CANDIDATES:
            aucs = []
            for seed in SEEDS:
                labels, feats = make_wsi_scale_bags(seed, **GEN, **kw)
                train_bags, test_bags = split(labels, feats, seed)
                auc, w = run_mine(trainer, train_bags, test_bags, seed,
                                  lr=lr)
                aucs.append(auc)
                print(f"  {name} seed={seed}: auc={auc:.3f} w={w:.3f}",
                      flush=True)
            print(f"{name}: mean={sum(aucs) / len(aucs):.3f} "
                  f"{[round(a, 3) for a in aucs]}", flush=True)
    else:
        for seed in REF_SEEDS:
            labels, feats = make_wsi_scale_bags(seed, **GEN, **CHOSEN)
            train_bags, test_bags = split(labels, feats, seed)
            auc, w = train_reference_recipe(train_bags, test_bags, seed=seed,
                                            lr=lr)
            print(f"ref seed={seed}: auc={auc:.3f} w={w:.3f}", flush=True)


if __name__ == "__main__":
    main()
