"""Statistical training parity: my trainer vs the torch reference trained
on the SAME synthetic bags with the same hyperparameters and loss
semantics. Nondeterminism (bag order, random shares, init) means parity is
an AUC band, not bitwise (SURVEY.md §7 'Nondeterminism parity')."""

import copy
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def make_bags(rng, num_bags, d=32):
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    labels, feats = [], []
    for i in range(num_bags):
        n = int(rng.integers(15, 40))
        x = rng.standard_normal((n, d)).astype(np.float32)
        y = i % 2
        if y:
            x[: max(2, n // 4)] += 2.5 * direction
        labels.append(float(y))
        feats.append(x)
    return labels, feats


def train_reference(train_bags, test_bags, d, lam, heads, epochs, lr, seed):
    """The reference's training semantics in a minimal loop: per-bag Adam
    steps on w·BCE(bag) + (1−w)·BCE(max-instance), w = 0.5 fixed
    (reference train.py:223-293, 828-846)."""
    sys.path.insert(0, REF)
    import snuffy as ref_snuffy

    sys.path.remove(REF)
    torch.manual_seed(seed)
    model = ref_snuffy.MILNet(
        ref_snuffy.FCLayer(d, 1),
        ref_snuffy.BClassifier(
            ref_snuffy.Encoder(
                ref_snuffy.EncoderLayer(
                    d,
                    copy.deepcopy(ref_snuffy.MultiHeadedAttention(heads, d)),
                    copy.deepcopy(
                        ref_snuffy.PositionwiseFeedForward(d, d * 2, "relu", 0.0)
                    ),
                    0.0, lam, 0.25,
                ),
                1,
            ),
            1, d,
        ),
    )
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(0.9, 0.999))
    crit = torch.nn.BCEWithLogitsLoss()
    labels, feats = train_bags
    rng = np.random.default_rng(seed)
    model.train()
    for _ in range(epochs):
        order = rng.permutation(len(labels))
        for i in order:
            bag = torch.from_numpy(feats[i])[None]
            y = torch.tensor([[labels[i]]], dtype=torch.float32)
            ins, bag_logit, _ = model(bag)
            max_logit, _ = torch.max(ins, 1)
            loss = 0.5 * crit(bag_logit.view(1, -1), y) + 0.5 * crit(
                max_logit.view(1, -1), y
            )
            opt.zero_grad()
            loss.backward()
            opt.step()

    model.eval()
    scores = []
    with torch.no_grad():
        for x in test_bags[1]:
            ins, bag_logit, _ = model(torch.from_numpy(x)[None])
            max_logit, _ = torch.max(ins, 1)
            scores.append(float(
                0.5 * torch.sigmoid(bag_logit).reshape(-1)[0]
                + 0.5 * torch.sigmoid(max_logit).reshape(-1)[0]
            ))
    from sklearn.metrics import roc_auc_score

    return roc_auc_score(test_bags[0], scores)


def train_mine(train_bags, test_bags, d, lam, heads, epochs, lr, seed):
    from sklearn.metrics import roc_auc_score

    from snuffy_tpu.configs import (
        MILTrainConfig,
        OptimizerConfig,
        SnuffyModelConfig,
    )
    from snuffy_tpu.train.runner import bucket_bags
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=d, num_heads=heads, big_lambda=lam,
            random_patch_share=0.25, mlp_multiplier=2,
            encoder_dropout=0.0, attention_dropout=0.0, use_pallas=False,
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=lr, betas=(0.9, 0.999)),
        soft_average=False,
        dataset="camelyon16",
    )
    trainer = SnuffyTrainer(cfg)
    state = trainer.init_state(seed)
    host_rng = np.random.default_rng(seed)
    tr_labels = [np.array([l], np.float32) for l in train_bags[0]]
    for _ in range(epochs):
        bucketed = bucket_bags(tr_labels, train_bags[1], rng=host_rng)
        state, *_ = trainer.run_train_epoch(state, bucketed, lr, host_rng,
                                            seed)
    te_labels = [np.array([l], np.float32) for l in test_bags[0]]
    bucketed = bucket_bags(te_labels, test_bags[1], rng=host_rng)
    _, scores, _, order = trainer.run_eval_epoch(state, bucketed, seed)
    labels_arr = np.asarray(test_bags[0])[order]
    return roc_auc_score(labels_arr, scores.reshape(-1))


def test_training_dynamics_parity():
    rng = np.random.default_rng(21)
    d, lam, heads, epochs, lr = 32, 8, 2, 6, 1e-3
    train_bags = make_bags(rng, 40, d)
    test_bags = make_bags(rng, 30, d)
    # share the discriminative direction: regenerate test with train's rng
    # state is fine — make_bags draws a fresh direction, so rebuild test
    # from the same direction by concatenating and splitting instead.
    all_labels, all_feats = make_bags(np.random.default_rng(33), 70, d)
    train_bags = (all_labels[:40], all_feats[:40])
    test_bags = (all_labels[40:], all_feats[40:])

    auc_ref = train_reference(train_bags, test_bags, d, lam, heads, epochs,
                              lr, seed=0)
    auc_mine = train_mine(train_bags, test_bags, d, lam, heads, epochs, lr,
                          seed=0)
    print(f"reference AUC {auc_ref:.3f} vs mine {auc_mine:.3f}")
    assert auc_ref > 0.8, f"reference failed to learn ({auc_ref:.3f})"
    assert auc_mine > 0.8, f"mine failed to learn ({auc_mine:.3f})"
    assert abs(auc_ref - auc_mine) < 0.15
