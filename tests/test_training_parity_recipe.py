"""Recipe-scale training parity: the ACTUAL Camelyon16 DINO-adapter recipe
(Λ=500, ρ=0.5, d=384, AdamW lr=0.02 wd=0.05 betas=(0.9,0.999), cosine,
soft_average=1, encoder_dropout=0.1, relu, pos-weighted BCE — reference
README.md:630-652 + train.py defaults) on WSI-scale synthetic bags
(N≈2k-6k), my trainer vs the torch reference loop, ≥20 epochs.

Gated behind RUN_SLOW=1: the torch-CPU reference loop needs ~10+ minutes at
these shapes. Run with  RUN_SLOW=1 python -m pytest
tests/test_training_parity_recipe.py -q -s
"""

import copy
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference checkout not available"),
    pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                       reason="recipe-scale parity takes ~20 min (RUN_SLOW=1)"),
]


def make_wsi_scale_bags(seed, num_bags, d=384, n_lo=2048, n_hi=6000,
                        num_classes=1, n_proto=32, noise=0.3,
                        tumor_blend=0.0, tumor_frac_lo=0.04,
                        tumor_frac_hi=0.04, distractor_frac=0.0,
                        distractor_strength=0.25, label_noise=0.0):
    """Planted-signal MIL bags at Camelyon16 scale with REALISTIC feature
    geometry: patches are drawn from a small set of unit prototype
    directions plus noise (real SSL embeddings are low-intrinsic-dimension
    clusters, not isotropic gaussians — the reference's torch loop NaNs at
    the recipe lr=0.02 on isotropic features but trains cleanly on
    clustered ones; verified both ways). Positive bags carry 'tumor'
    patches from class prototypes. Consumers l2-normalize
    (l2normed_embeddings=1).

    Hardness knobs (VERDICT r2 next-6: target a NON-saturated regime where
    the reference lands at AUC ≈0.8-0.9 so parity is testable two-sided):
      tumor_blend      — mix the tumor direction toward a background
                         prototype (0 = orthogonal fresh direction, →1 =
                         indistinguishable from background cluster 0);
      tumor_frac_lo/hi — per-bag tumor share drawn uniformly in this range
                         (variable evidence → some positives are hard);
      distractor_frac  — NEGATIVE bags carry this share of near-tumor
                         patches, overlapping the class-conditional score
                         tails;
      distractor_strength — tumor weight in the distractor direction
                         (s·tumor + (1−s)·background). At s=0.5 the
                         distractor has cos≈0.82 to real tumor — measured
                         to collapse the task to chance (12-train-bag
                         runs at AUC 0.48-0.58); s=0.25 → cos≈0.67;
      label_noise      — probability of flipping a bag's label (binary
                         only; applied after generation, i.e. train AND
                         test labels — test AUC then caps below 1).
    """
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((n_proto, d))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    tumor = rng.standard_normal((max(num_classes, 1), d))
    tumor /= np.linalg.norm(tumor, axis=1, keepdims=True)
    if tumor_blend > 0.0:
        tumor = (1.0 - tumor_blend) * tumor + tumor_blend * protos[:1]
        tumor /= np.linalg.norm(tumor, axis=1, keepdims=True)
    s = distractor_strength
    near_tumor = s * tumor[0] + (1.0 - s) * protos[0]
    near_tumor /= np.linalg.norm(near_tumor)
    labels, feats = [], []
    for i in range(num_bags):
        n = int(rng.integers(n_lo, n_hi))
        which = rng.integers(0, n_proto, n)
        x = protos[which] + noise * rng.standard_normal((n, d))
        frac = rng.uniform(tumor_frac_lo, tumor_frac_hi)
        k = max(4, int(round(n * frac)))
        if num_classes == 1:
            y = i % 2
            if y:
                x[:k] = tumor[0] + noise * rng.standard_normal((k, d))
            elif distractor_frac > 0.0:
                kd = max(2, int(round(n * distractor_frac)))
                x[:kd] = near_tumor + noise * rng.standard_normal((kd, d))
            if label_noise > 0.0 and rng.uniform() < label_noise:
                y = 1 - y
            labels.append(float(y))
        else:
            y = i % num_classes
            x[:k] = tumor[y] + noise * rng.standard_normal((k, d))
            onehot = np.zeros(num_classes, np.float32)
            onehot[y] = 1.0
            labels.append(onehot)
        rng.shuffle(x)
        feats.append(x.astype(np.float32))
    return labels, feats


RECIPE = dict(d=384, lam=500, rho=0.5, heads=4, depth=1, lr=2e-2, wd=5e-2,
              betas=(0.9, 0.999), epochs=20, encoder_dropout=0.1,
              activation="relu")


def _l2norm(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _ref_modules():
    sys.path.insert(0, REF)
    import snuffy as ref_snuffy
    import snuffy_multiclass as ref_mc

    sys.path.remove(REF)
    return ref_snuffy, ref_mc


def _ref_weight_init(milnet):
    """weight_init__weight_init_i__weight_init_b =
    ['trunc_normal','xavier_uniform','trunc_normal'] (reference
    train.py:893-911: >1-dim params of each submodule)."""
    for name, p in milnet.named_parameters():
        if p.dim() <= 1:
            continue
        if name.split(".")[0] == "i_classifier":
            torch.nn.init.xavier_uniform_(p)
        elif name.split(".")[0] == "b_classifier":
            torch.nn.init.trunc_normal_(p)
    return milnet


def fit_reference_recipe(train_bags, multiclass=False, seed=0, lr=None):
    """Train the reference hot loop at the recipe point (train.py:249-293 +
    SmallWeightTrainer semantics: learnable w with clamp, grouped AdamW,
    per-epoch CosineAnnealingLR, pos-weighted BCE). `lr` overrides the
    recipe lr (see STABLE_LR below). Returns (milnet, w)."""
    from snuffy_tpu.train.schedules import cosine_annealing

    ref_snuffy, ref_mc = _ref_modules()
    mod = ref_mc if multiclass else ref_snuffy
    r = RECIPE
    lr = lr or r["lr"]
    torch.manual_seed(seed)
    num_classes = len(train_bags[0][0]) if multiclass else 1
    c = copy.deepcopy
    attn = mod.MultiHeadedAttention(r["heads"], r["d"])
    if multiclass:
        # snuffy_multiclass signatures: FFN has no dropout arg (0.1
        # default), EncoderLayer takes num_class (reference
        # train.py:923-948).
        ff = mod.PositionwiseFeedForward(r["d"], r["d"] * 4, r["activation"])
        layer = mod.EncoderLayer(r["d"], c(attn), c(ff), num_classes,
                                 r["encoder_dropout"], r["lam"], r["rho"])
    else:
        ff = mod.PositionwiseFeedForward(r["d"], r["d"] * 4, r["activation"],
                                         r["encoder_dropout"])
        layer = mod.EncoderLayer(r["d"], c(attn), c(ff),
                                 r["encoder_dropout"], r["lam"], r["rho"])
    milnet = _ref_weight_init(mod.MILNet(
        mod.FCLayer(r["d"], num_classes),
        mod.BClassifier(
            mod.Encoder(layer, r["depth"]),
            num_classes, r["d"],
        ),
    ))

    w = torch.tensor(0.5, requires_grad=True)
    opt = torch.optim.AdamW(
        params=[{"params": w, "lr": lr},
                {"params": milnet.parameters()}],
        lr=lr, betas=r["betas"], weight_decay=r["wd"],
    )
    labels, feats = train_bags
    # reference utils.py:499-507: ELEMENTWISE clip-sum → per-class vector
    # for one-hot multiclass labels, scalar for binary.
    pos = sum(np.clip(np.asarray(l, np.float64), 0, 1) for l in labels)
    pos_weight = torch.tensor((len(labels) - pos) / pos, dtype=torch.float32)
    crit = torch.nn.BCEWithLogitsLoss(pos_weight)
    sched = cosine_annealing(lr, r["epochs"], 0.0)

    host = np.random.default_rng(seed)
    milnet.train()
    for epoch in range(r["epochs"]):
        for g in opt.param_groups:
            g["lr"] = sched(epoch)
        for i in host.permutation(len(labels)):
            x = torch.from_numpy(_l2norm(feats[i]))[None]
            y = torch.tensor(np.atleast_1d(labels[i]),
                             dtype=torch.float32).view(1, -1)
            ins, bag_logit, _ = milnet(x)
            max_logit, _ = torch.max(ins, 1)
            loss = w * crit(bag_logit.view(1, -1), y) + (1 - w) * crit(
                max_logit.view(1, -1), y)
            loss.backward()
            opt.step()
            opt.zero_grad()
            w.data.clamp_(0, 1)
    return milnet, w


def eval_reference_bags(milnet, w, bags):
    """Reference eval semantics on a bag list: mixed sigmoid bag score
    (SmallWeightTrainer._run_model, train.py:841-846) + raw instance
    logits (the `attentions` the valid loop feeds into feat metrics and
    FROC detections, train.py:345-360)."""
    milnet.eval()
    scores, ins_all = [], []
    with torch.no_grad():
        for x in bags[1]:
            ins, bag_logit, _ = milnet(torch.from_numpy(_l2norm(x))[None])
            max_logit, _ = torch.max(ins, 1)
            s = ((1 - w) * torch.sigmoid(max_logit)
                 + w * torch.sigmoid(bag_logit)).reshape(-1).numpy()
            scores.append(s)
            ins_all.append(ins.reshape(-1).numpy())
    return np.asarray(scores), ins_all


def train_reference_recipe(train_bags, test_bags, multiclass=False, seed=0,
                           lr=None):
    """fit + eval → (test AUC, w) — the original recipe-parity entry."""
    from sklearn.metrics import roc_auc_score

    milnet, w = fit_reference_recipe(train_bags, multiclass=multiclass,
                                     seed=seed, lr=lr)
    scores, _ = eval_reference_bags(milnet, w, test_bags)
    y_true = np.asarray(test_bags[0])
    if multiclass:
        return float(np.mean([
            roc_auc_score(y_true[:, k], scores[:, k])
            for k in range(y_true.shape[1])
        ])), float(w.detach())
    return roc_auc_score(y_true, scores[:, 0]), float(w.detach())


def train_mine_recipe(train_bags, test_bags, bag_batch_size=1,
                      multiclass=False, seed=0, lr=None):
    from sklearn.metrics import roc_auc_score

    from snuffy_tpu.configs import (MILTrainConfig, OptimizerConfig,
                                    SnuffyModelConfig)
    from snuffy_tpu.train.runner import bucket_bags, compute_pos_weight
    from snuffy_tpu.train.schedules import cosine_annealing
    from snuffy_tpu.train.trainer import SnuffyTrainer

    r = RECIPE
    lr = lr or r["lr"]
    num_classes = len(train_bags[0][0]) if multiclass else 1
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=r["d"], num_classes=num_classes, num_heads=r["heads"],
            big_lambda=r["lam"], random_patch_share=r["rho"],
            encoder_dropout=r["encoder_dropout"], activation=r["activation"],
            depth=r["depth"], multiclass=multiclass,
            weight_init_i="xavier_uniform", weight_init_b="trunc_normal",
            use_pallas=False,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=lr,
                              weight_decay=r["wd"], betas=r["betas"]),
        soft_average=True,
        bag_batch_size=bag_batch_size,
        dataset="camelyon16",
    )
    trainer = SnuffyTrainer(cfg)
    tr_labels = [np.atleast_1d(np.asarray(l, np.float32))
                 for l in train_bags[0]]
    trainer.pos_weight = compute_pos_weight(train_bags[0])
    state = trainer.init_state(seed)
    sched = cosine_annealing(lr, r["epochs"], 0.0)
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
    if multiclass:
        return float(np.mean([
            roc_auc_score(y_true[:, k], scores[:, k])
            for k in range(y_true.shape[1])
        ])), float(state.w)
    return roc_auc_score(y_true, scores[:, 0]), float(state.w)


# Design calibrated with tools/calibrate_recipe_bags.py (full sweep
# history there) so the parity band is NON-saturated and TWO-SIDED
# (VERDICT r2 next-6; round-2's bags saturated at ours=1.0 vs ref=0.875):
#
# 1. Ceiling: flip an EXACT count of test labels (6/48). Both frameworks
#    rank the same flipped set, a perfect ranker of the TRUE labels
#    measures 0.875 (an imperfect one can exceed it slightly when its
#    errors happen to agree with flipped labels — ref seed 15 measured
#    0.885), and a regression in EITHER framework drops below it. This mechanism
#    is variance-free — unlike every stochastic hardness knob
#    (distractors / Bernoulli label noise / strong blend), all of which
#    measured as learning CLIFFS with giant seed variance at ≤16 train
#    bags.
# 2. Geometry: the stable regime round 2 proved (n 1300-2040 → one 2048
#    padding bucket, fixed 4% tumor share, no blend) — stably learnable,
#    so the only thing between a working framework and the 0.875 ceiling
#    is ranking noise on 48 bags.
# 3. Learning rate: the tight band runs at STABLE_LR=5e-3, NOT the
#    recipe's lr=0.02, because the recipe lr is MEASURED-BIMODAL at this
#    toy scale in the reference itself: three torch init seeds on
#    identical bags landed at 0.468 / 0.743 / 0.821, and a re-run of
#    round-2's exact bags moved 0.875 → 0.688 (single-vCPU BLAS
#    scheduling changes summation order run-to-run — CLAUDE.md chaotic-
#    regime note). Ours is bimodal there too (0.845/0.844/0.472 across
#    seeds). No two-sided band can hold where both sides are bimodal;
#    at 5e-3 the SAME model/optimizer/schedule/data path is deterministic
#    enough for a tight band (ours: 0.78-0.85 over 5 seeds, mean 0.816).
#    test_recipe_lr_can_learn keeps the lr=0.02 point covered.
HARD = dict(tumor_blend=0.0, tumor_frac_lo=0.04, tumor_frac_hi=0.04)
GEN = dict(num_bags=60, n_lo=1300, n_hi=2040)
SEEDS = (13, 14, 15)
STABLE_LR = 5e-3
N_TRAIN, N_TEST_FLIPS = 12, 6


def flip_exact(labels, k, seed):
    """Flip exactly k binary labels (or swap one-hot rows), seed-chosen."""
    rng = np.random.default_rng(seed + 10_000)
    idx = rng.choice(len(labels), k, replace=False)
    out = list(labels)
    for i in idx:
        out[i] = (1.0 - np.asarray(out[i])) if np.ndim(out[i]) \
            else 1.0 - out[i]
    return out


def _gen(seed, **overrides):
    # n range spans a single padding bucket (2048) — one compile per
    # program on the relay backend (see tools/calibrate_recipe_bags.py)
    kw = dict(**GEN, **HARD)
    kw.update(overrides)
    labels, feats = make_wsi_scale_bags(seed, **kw)
    te_labels = flip_exact(labels[N_TRAIN:], N_TEST_FLIPS, seed)
    return ((labels[:N_TRAIN], feats[:N_TRAIN]),
            (te_labels, feats[N_TRAIN:]))


_REF_CACHE: dict = {}


def _ref_binary(seed, lr=STABLE_LR):
    """The torch loop takes ~10 min/seed on this rig — cache per seed
    (bags are a pure function of seed + GEN + HARD)."""
    if (seed, lr) not in _REF_CACHE:
        train_bags, test_bags = _gen(seed)
        _REF_CACHE[(seed, lr)] = train_reference_recipe(
            train_bags, test_bags, seed=seed, lr=lr)
    return _REF_CACHE[(seed, lr)]


def test_recipe_scale_binary_parity_two_sided():
    """3 seeds, both frameworks, identical bags at STABLE_LR: the MEANS
    must agree two-sided and neither side may saturate (VERDICT r2
    next-6; the 0.875 flip ceiling keeps saturation impossible)."""
    refs, serials = [], []
    for seed in SEEDS:
        train_bags, test_bags = _gen(seed)
        auc_ref, w_ref = _ref_binary(seed)
        auc_mine, w_mine = train_mine_recipe(train_bags, test_bags, 1,
                                             seed=seed, lr=STABLE_LR)
        print(f"\nseed {seed}: ref {auc_ref:.3f} (w={w_ref:.3f}) vs "
              f"serial {auc_mine:.3f} (w={w_mine:.3f})")
        refs.append(auc_ref)
        serials.append(auc_mine)
        # per-seed guard: loose band both ways (48 test bags/run)
        assert abs(auc_mine - auc_ref) < 0.15
    ref_m = float(np.mean(refs))
    mine_m = float(np.mean(serials))
    print(f"means: ref {ref_m:.3f} vs serial {mine_m:.3f}")
    # both must learn, and neither may saturate — the regime where a
    # regression in EITHER direction is measurable
    assert 0.70 < ref_m < 0.93, f"reference out of band ({ref_m:.3f})"
    assert 0.70 < mine_m < 0.93, f"rebuild out of band ({mine_m:.3f})"
    assert abs(mine_m - ref_m) < 0.08


def test_recipe_scale_binary_batched_mode():
    """Batched-bags mode (one optimizer step per 4 bags) on one seed:
    relaxes serial-SGD semantics, so a wider band."""
    train_bags, test_bags = _gen(SEEDS[0])
    auc_ref, _ = _ref_binary(SEEDS[0])
    auc_batched, _ = train_mine_recipe(train_bags, test_bags, 4,
                                       seed=SEEDS[0], lr=STABLE_LR)
    print(f"\nbatched: ref {auc_ref:.3f} vs batched {auc_batched:.3f}")
    assert abs(auc_batched - auc_ref) < 0.2


def test_recipe_lr_can_learn():
    """The recipe's own lr=0.02 stays covered one-sided: at toy scale it
    is measured-bimodal in BOTH frameworks (see the design note above —
    torch lands 0.468-0.821 across init seeds on identical bags), so no
    two-sided band exists; assert ours reaches the ceiling-adjacent mode
    on the majority of seeds, i.e. the recipe point can still learn."""
    aucs = []
    for seed in SEEDS:
        train_bags, test_bags = _gen(seed)
        auc, _ = train_mine_recipe(train_bags, test_bags, 1, seed=seed,
                                   lr=RECIPE["lr"])
        print(f"\nrecipe-lr seed {seed}: {auc:.3f}")
        aucs.append(auc)
    good = sum(a > 0.75 for a in aucs)
    print(f"recipe-lr aucs: {[round(a, 3) for a in aucs]}")
    assert good >= 2, f"recipe-lr failed to learn on {aucs}"


def test_recipe_scale_multiclass_parity():
    refs, mines = [], []
    for seed in (13, 14):
        all_labels, all_feats = make_wsi_scale_bags(
            seed, num_classes=2, **GEN, **HARD)
        te_labels = flip_exact(all_labels[N_TRAIN:], N_TEST_FLIPS, seed)
        train_bags = (all_labels[:N_TRAIN], all_feats[:N_TRAIN])
        test_bags = (te_labels, all_feats[N_TRAIN:])
        auc_ref, _ = train_reference_recipe(train_bags, test_bags,
                                            multiclass=True, seed=seed,
                                            lr=STABLE_LR)
        auc_mine, _ = train_mine_recipe(train_bags, test_bags, 1,
                                        multiclass=True, seed=seed,
                                        lr=STABLE_LR)
        print(f"\nmulticlass seed {seed}: ref {auc_ref:.3f} vs "
              f"mine {auc_mine:.3f}")
        refs.append(auc_ref)
        mines.append(auc_mine)
        assert abs(auc_mine - auc_ref) < 0.15
    ref_m = float(np.mean(refs))
    mine_m = float(np.mean(mines))
    print(f"multiclass means: ref {ref_m:.3f} vs mine {mine_m:.3f}")
    assert 0.70 < ref_m < 0.95, f"reference out of band ({ref_m:.3f})"
    assert 0.70 < mine_m < 0.95, f"rebuild out of band ({mine_m:.3f})"
    assert abs(mine_m - ref_m) < 0.10


# ===================================================================== item 4
# Recipe run that EXITS THROUGH FROC + ECE in both frameworks (VERDICT r4
# item 4): synthetic Camelyon16-shaped slides with real on-disk mask TIFs,
# my Runner.run() driving trainer → evaluate → challenge FROC + ECE, vs the
# torch reference loop driving /root/reference/froc.py's own
# mp_computeFROC_list_no_cache on masks/detections of identical geometry.

FROC_GRID = 24        # 24×24 patch grid → 576 patches/slide ≥ Λ=500
FROC_BLOCK = 6        # 6×6 tumor patch block (6.3% tumor share)
FROC_SPACING = 0.243  # CAMELYON16 scanner µm/px at level 0
FROC_LEVEL = 5        # challenge evaluation mask level (both frameworks)


def make_froc_split(rng, protos, tumor_dir, n_slides, prefix=None,
                    d=384, noise=0.2):
    """Slides on a FROC_GRID×FROC_GRID patch grid. Tumor slides carry a
    FROC_BLOCK² contiguous block of tumor-feature patches whose level-0
    rectangle (×512 px/patch) is the mask's label-2 region — so instance
    scores, positions (f'{col}_{row}' → x=col·512+256, reference
    train.py:345-349), and masks are geometrically consistent end to end.
    Returns (labels, feats, feats_labels, positions, names, blocks) where
    blocks[i] is the (r0, c0) tumor block offset or None."""
    g = FROC_GRID
    cols_rows = [(c, r) for r in range(g) for c in range(g)]
    positions_template = [f"{c}_{r}" for c, r in cols_rows]
    labels, feats, feats_labels, positions, names, blocks = \
        [], [], [], [], [], []
    for i in range(n_slides):
        y = i % 2
        n = g * g
        which = rng.integers(0, len(protos), n)
        x = protos[which] + noise * rng.standard_normal((n, d))
        fl = np.zeros(n, np.float32)
        block = None
        if y:
            r0 = int(rng.integers(1, g - FROC_BLOCK - 1))
            c0 = int(rng.integers(1, g - FROC_BLOCK - 1))
            block = (r0, c0)
            for rr in range(r0, r0 + FROC_BLOCK):
                for cc in range(c0, c0 + FROC_BLOCK):
                    j = rr * g + cc
                    x[j] = tumor_dir + noise * rng.standard_normal(d)
                    fl[j] = 1.0
        labels.append(np.array([float(y)], np.float32))
        feats.append(x.astype(np.float32))
        feats_labels.append(fl)
        positions.append(list(positions_template))
        names.append(None if prefix is None else
                     f"{'tumor' if y else 'normal'}_{prefix}{i:03d}")
        blocks.append(block)
    return labels, feats, feats_labels, positions, names, blocks


def _write_froc_masks(mask_dir, names, blocks, itc_for_even=True):
    """Multi-page mask TIFs via the native writer: tumor slides get the
    level-0 label-2 rectangle of their block (plus, on every other tumor
    slide, a 32-px isolated-tumor-cell speck that the ITC rule must drop
    in BOTH evaluators); normal slides get a tiny all-zero pyramid (the
    reference's load_detections_list still opens them for the downsample,
    froc.py:50-56)."""
    from snuffy_tpu import native

    os.makedirs(mask_dir, exist_ok=True)
    side0 = FROC_GRID * 512
    t_idx = 0
    for name, block in zip(names, blocks):
        path = os.path.join(mask_dir, f"{name}_mask.tif")
        if block is None:
            levels = [np.zeros((64 >> k, 64 >> k), np.uint8)
                      for k in range(6)]
            native.write_tiled_tiff_gray(path, levels, tile=16,
                                         spacing_um=FROC_SPACING * 512 / 64)
            continue
        r0, c0 = block
        lvl0 = np.zeros((side0, side0), np.uint8)
        lvl0[r0 * 512:(r0 + FROC_BLOCK) * 512,
             c0 * 512:(c0 + FROC_BLOCK) * 512] = 2
        if itc_for_even and t_idx % 2 == 0:
            lvl0[11900:11932, 11900:11932] = 2   # ITC: ~1 px at level 5
        t_idx += 1
        levels = [lvl0]
        for _ in range(5):
            levels.append(levels[-1][::2, ::2])
        native.write_tiled_tiff_gray(path, levels, tile=256,
                                     spacing_um=FROC_SPACING)
        del levels, lvl0


def _import_reference_froc():
    """Load /root/reference/froc.py with its ASAP reader (mir) and skimage
    shimmed — PIL-backed MultiResolutionImageReader, scipy 8-connected
    label + the closed-form major_axis_length (validated against skimage's
    definition in tests/test_froc.py::test_major_axis_lengths_square).
    Everything downstream (dilation, ITC rule, TP/FP assignment, curve,
    score, the mp pool) is the reference's own code."""
    import importlib.util
    import types

    from PIL import Image

    import scipy.ndimage

    from snuffy_tpu.eval.froc import major_axis_lengths

    class _MirImage:
        def __init__(self, path):
            self._path = path
            with Image.open(path) as img:
                self._base = img.size
                self._n = getattr(img, "n_frames", 1)

        def getLevelDimensions(self, level):
            with Image.open(self._path) as img:
                img.seek(level)
                return img.size

        def getUCharPatch(self, startX, startY, width, height, level):
            with Image.open(self._path) as img:
                img.seek(level)
                arr = np.asarray(img, np.uint8)
            return arr[startY:startY + height, startX:startX + width]

        def getSpacing(self):
            with Image.open(self._path) as img:
                xres = img.tag_v2.get(282)
                unit = int(img.tag_v2.get(296, 2))
                per_unit = float(xres[0]) / float(xres[1]) \
                    if isinstance(xres, tuple) else float(xres)
                um = {2: 25_400.0, 3: 10_000.0}[unit]
                return [um / per_unit]

        def getLevelDownsample(self, level):
            with Image.open(self._path) as img:
                img.seek(level)
                return self._base[0] / img.size[0]

    class _MirReader:
        def open(self, path):
            return _MirImage(path)

    def _label(label_image, connectivity=2):
        assert connectivity == 2
        return scipy.ndimage.label(label_image,
                                   structure=np.ones((3, 3), int))[0]

    class _Region:
        def __init__(self, length):
            self.major_axis_length = length

    def _regionprops(label_image):
        n = int(label_image.max())
        lengths = major_axis_lengths(label_image, n)
        return [_Region(lengths[k]) for k in range(1, n + 1)]

    mir_mod = sys.modules.get("multiresolutionimageinterface")
    if mir_mod is None:
        mir_mod = types.ModuleType("multiresolutionimageinterface")
        sys.modules["multiresolutionimageinterface"] = mir_mod
    mir_mod.MultiResolutionImageReader = _MirReader
    sk = sys.modules.get("skimage") or types.ModuleType("skimage")
    skm = sys.modules.get("skimage.measure") or \
        types.ModuleType("skimage.measure")
    skm.label = lambda label_image, connectivity=2: _label(
        label_image, connectivity)
    skm.regionprops = lambda label_image: _regionprops(label_image)
    sk.measure = skm
    sys.modules["skimage"] = sk
    sys.modules["skimage.measure"] = skm

    spec = importlib.util.spec_from_file_location(
        "ref_froc_module", os.path.join(REF, "froc.py"))
    ref_froc = importlib.util.module_from_spec(spec)
    sys.modules["ref_froc_module"] = ref_froc  # mp pool re-import by name
    sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(ref_froc)
    finally:
        sys.path.remove(REF)
    return ref_froc


def test_recipe_exits_through_froc_and_ece_both_frameworks(tmp_path):
    """The last stretch of the L5→L6 chain at recipe scale (VERDICT r4
    item 4): both frameworks train the recipe on identical synthetic
    slides, then exit through their FULL evaluation paths — mine via
    Runner.run() (checkpoints → thresholds JSON → test-at-last-epoch →
    challenge FROC on on-disk mask TIFs + ECE), the torch reference via
    its valid(mode='test') semantics feeding froc.py's own
    mp_computeFROC_list_no_cache and metrics.ECELoss. Asserts two-sided
    parity on test AUC, FROC score, and ECE — plus EXACT evaluator parity
    (my froc_for_slides on the reference's own detections reproduces the
    reference evaluator's score)."""
    import pandas as pd

    from snuffy_tpu import native
    from snuffy_tpu.configs import (MILTrainConfig, OptimizerConfig,
                                    SnuffyModelConfig)
    from snuffy_tpu.eval.froc import froc_for_slides
    from snuffy_tpu.eval.metrics import ece_loss, multi_label_roc
    from snuffy_tpu.train.runner import Runner
    from snuffy_tpu.train.schedules import cosine_annealing
    from snuffy_tpu.train.trainer import SnuffyTrainer
    from sklearn.metrics import roc_auc_score

    if not native.available():
        pytest.skip("native library unavailable (mask TIF writer)")

    seed, d, r = 13, 384, RECIPE
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((32, d))
    protos /= np.linalg.norm(protos, axis=1, keepdims=True)
    tumor_dir = rng.standard_normal(d)
    tumor_dir /= np.linalg.norm(tumor_dir)

    # Deliberately EASIER features than the strict-parity bags above
    # (noise 0.2, 6.3% tumor share): this test's subject is the exit
    # through the evaluation chain, which needs BOTH frameworks to
    # genuinely learn and localize so the FROC/ECE comparisons carry
    # signal — non-saturated AUC parity is the other tests' job.
    tr = make_froc_split(rng, protos, tumor_dir, 16)
    va = make_froc_split(rng, protos, tumor_dir, 12)
    te = make_froc_split(rng, protos, tumor_dir, 24, prefix="t")

    masks = str(tmp_path / "masks")
    _write_froc_masks(masks, te[4], te[5])
    ref_csv = str(tmp_path / "reference.csv")
    pd.DataFrame({"image": [f"{n}.tif" for n in te[4]],
                  "type": ["tumor" if b else "normal" for b in te[5]]}
                 ).to_csv(ref_csv, index=False)

    # ---------------- torch reference: train → valid threshold → test ----
    milnet, w = fit_reference_recipe((tr[0], tr[1]), seed=seed,
                                     lr=STABLE_LR)
    _, va_ins = eval_reference_bags(milnet, w, (va[0], va[1]))
    va_flat_labels = np.concatenate(va[2]).astype(float)
    va_flat_ins = np.concatenate(va_ins)
    _, _, ref_feat_th = multi_label_roc(va_flat_labels, va_flat_ins, 1,
                                        for_feats=True)
    te_scores, te_ins = eval_reference_bags(milnet, w, (te[0], te[1]))
    y_true = np.asarray(te[0]).reshape(-1)
    ref_auc = roc_auc_score(y_true, te_scores[:, 0])
    # ECE exactly as the reference's _calibration_cal (train.py:413-451):
    # mixed sigmoid bag scores, logits=False, n_bins=args.bins=10 — via the
    # reference's own metrics.py.
    sys.path.insert(0, REF)
    try:
        import importlib
        ref_metrics = importlib.import_module("metrics")
    finally:
        sys.path.remove(REF)
    ref_ece = float(ref_metrics.ECELoss().loss(
        te_scores.reshape(-1, 1), y_true.reshape(-1, 1), 0.5,
        n_bins=10, logits=False))

    # detections: mp_thresholding semantics (train.py:138-141, 345-349) —
    # strict >, x = col·512+256, y = row·512+256 at level 0.
    ref_dets = {}
    for name, pos_list, ins in zip(te[4], te[3], te_ins):
        dets = []
        for p, prob in zip(pos_list, ins):
            if float(prob) > ref_feat_th[0]:
                col, row = map(int, p.split("_"))
                dets.append((float(prob), col * 512 + 256, row * 512 + 256))
        ref_dets[name] = dets

    ref_froc_mod = _import_reference_froc()
    ref_froc_score = float(ref_froc_mod.mp_computeFROC_list_no_cache(
        ref_csv, masks, ref_dets, "", False, False, FROC_LEVEL,
        list(te[4]), str(tmp_path / "froc_plot"), "ref", 1,
    ))

    # EXACT evaluator parity: my FROC stack on the reference's detections.
    types_by_name = {n: ("tumor" if b else "normal")
                     for n, b in zip(te[4], te[5])}
    mine_on_ref_dets, _, _ = froc_for_slides(
        ref_dets, lambda s: os.path.join(masks, f"{s}_mask.tif"),
        types_by_name, evaluation_mask_level=FROC_LEVEL)
    assert mine_on_ref_dets == pytest.approx(ref_froc_score, abs=1e-9), (
        f"evaluator mismatch on identical detections: "
        f"{mine_on_ref_dets} vs {ref_froc_score}")

    # ---------------- mine: Runner.run() end to end ----------------------
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=d, num_classes=1, num_heads=r["heads"],
            big_lambda=r["lam"], random_patch_share=r["rho"],
            encoder_dropout=r["encoder_dropout"], activation=r["activation"],
            depth=r["depth"],
            weight_init_i="xavier_uniform", weight_init_b="trunc_normal",
            use_pallas=False,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=STABLE_LR,
                              weight_decay=r["wd"], betas=r["betas"]),
        num_epochs=r["epochs"], dataset="camelyon16",
        l2normed_embeddings=True, soft_average=True, seed=seed, bins=10,
        save_path=str(tmp_path / "runs"),
        camelyon16_mask_path=masks, camelyon16_reference=ref_csv,
    )
    trainer = SnuffyTrainer(cfg)
    runner = Runner(cfg, trainer,
                    (tr[0], tr[1], tr[2], None),
                    (va[0], va[1], va[2], None),
                    (te[0], te[1], te[2], te[3], te[4]))
    summary = runner.run(cosine_annealing(STABLE_LR, r["epochs"], 0.0))

    last = summary["test_last"]
    mine_auc = float(np.mean(last["epoch_test_last_aucs"]))
    mine_ece = float(last["epoch_test_last_ece"])
    assert "epoch_test_last_challenge_froc_score" in last, (
        "Runner.evaluate did not exit through FROC — gate failed: "
        f"{sorted(last)}")
    mine_froc = float(last["epoch_test_last_challenge_froc_score"])

    print(f"\nAUC  ref {ref_auc:.3f} vs mine {mine_auc:.3f}")
    print(f"FROC ref {ref_froc_score:.3f} vs mine {mine_froc:.3f} "
          f"(evaluator-exact on shared dets: {mine_on_ref_dets:.3f})")
    print(f"ECE  ref {ref_ece:.3f} vs mine {mine_ece:.3f}")

    # two-sided bands: both must genuinely learn/localize, neither may be
    # compared against a broken counterpart (24 test slides, 12 tumor
    # regions → FROC quantized at 1/12 per region).
    # measured (seed 13, STABLE_LR): AUC 1.000 vs 1.000, FROC 0.069 vs
    # 0.069 (and evaluator-exact 0.069 on shared detections), ECE 0.310
    # vs 0.333 — the FROC level is low because the max-instance loss
    # orders instances only weakly at 20 toy epochs, but BOTH frameworks
    # land on the same curve, which is the parity claim.
    assert ref_auc > 0.7 and mine_auc > 0.7
    assert abs(mine_auc - ref_auc) < 0.2
    assert 0.03 < ref_froc_score <= 1.0 and 0.03 < mine_froc <= 1.0
    assert abs(mine_froc - ref_froc_score) < 0.25
    assert abs(mine_ece - ref_ece) < 0.15
