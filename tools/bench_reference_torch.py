"""Measure the reference's MIL training hot loop (torch, CPU) as the baseline.

Builds the reference MILNet through the reference's own modules
(/root/reference/snuffy.py, imported as an oracle — same mechanism as
tests/test_reference_parity.py) at the flagship Camelyon16 DINO-adapter
operating point (d=384, Λ=512, ρ=0.5, depth=2, heads=4) and times its
per-bag train loop: l2norm + tensorize + forward + mixed loss + backward +
Adam/AdamW step + w-clamp — the exact work of reference train.py:249-262 +
_run_model (train.py:828-846) + _after_run_model_in_training_mode
(train.py:468-473, 852-854), minus wandb/stdout logging.

No CUDA in this container, so the number is torch-CPU; report it as such.
Writes the result into BASELINE.json under "measured".
"""

from __future__ import annotations

import copy
import json
import sys
import time

import numpy as np

REF = "/root/reference"
sys.path.insert(0, REF)

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

import snuffy as ref_snuffy  # noqa: E402


def build_ref_milnet(feats_size=384, num_classes=1, num_heads=4,
                     big_lambda=512, random_patch_share=0.5,
                     mlp_multiplier=4, encoder_dropout=0.0,
                     activation="gelu", depth=2):
    # Mirrors reference train.py:861-891 (Snuffy._get_milnet) construction.
    i_classifier = ref_snuffy.FCLayer(in_size=feats_size, out_size=num_classes)
    attn = ref_snuffy.MultiHeadedAttention(num_heads, feats_size)
    ff = ref_snuffy.PositionwiseFeedForward(
        feats_size, feats_size * mlp_multiplier, activation, encoder_dropout
    )
    b_classifier = ref_snuffy.BClassifier(
        ref_snuffy.Encoder(
            ref_snuffy.EncoderLayer(
                feats_size, copy.deepcopy(attn), copy.deepcopy(ff),
                encoder_dropout, big_lambda, random_patch_share,
            ),
            depth,
        ),
        num_classes,
        feats_size,
    )
    return ref_snuffy.MILNet(i_classifier, b_classifier)


def bench_extraction(batch=8, iters=3):
    """torch-CPU ViT-S/16 forward throughput through the reference's own
    vision transformer (dino_adapter/vision_transformer_with_adapter.py,
    imported as an oracle) — the baseline for the 'patch embeddings/sec'
    headline. The reference extracts with no_grad batches
    (compute_feats.py:200-266); same here, f32, eval mode."""
    # the reference module imports a skimage-needing `utils`; stub it to
    # just trunc_normal_ (same shim as tests/test_reference_parity.py)
    import importlib.util
    import os
    import types

    stub = types.ModuleType("utils")
    stub.trunc_normal_ = torch.nn.init.trunc_normal_
    sys.modules["utils"] = stub
    spec = importlib.util.spec_from_file_location(
        "vits_dino", os.path.join(REF, "utils_ssls_cf",
                                  "vision_transformer_dino.py")
    )
    ref_vit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_vit)

    torch.manual_seed(0)
    model = ref_vit.vit_small(patch_size=16)
    model.eval()
    x = torch.rand(batch, 3, 224, 224)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = (time.perf_counter() - t0) / iters
    ips = batch / dt
    print(f"reference torch-CPU ViT-S/16 extraction: {ips:.2f} img/s "
          f"(batch {batch})")

    with open("BASELINE.json") as f:
        base = json.load(f)
    base.setdefault("measured", {})["reference_vit_s16_imgs_per_sec"] = {
        "value": round(ips, 2),
        "unit": "img/s (ViT-S/16 fwd, f32, no_grad, torch-CPU batch 8)",
        "hardware": "torch CPU (no CUDA in container); reference "
                    "dino_adapter ViT, compute_feats.py:200-266 loop",
    }
    with open("BASELINE.json", "w") as f:
        json.dump(base, f, indent=2)
        f.write("\n")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "extract":
        bench_extraction()
        return
    torch.manual_seed(0)
    n, d, bags, iters = 10000, 384, 4, 2
    milnet = build_ref_milnet(feats_size=d)
    milnet.train()

    # SmallWeightTrainer optimizer groups (train.py:808-826): w gets
    # lr·multiplier, model params the base lr; AdamW wd=0.05 (README.md:630-652).
    w = torch.tensor(0.5, requires_grad=True)
    lr = 2e-2
    optimizer = torch.optim.AdamW(
        params=[{"params": w, "lr": lr * 1.0}, {"params": milnet.parameters()}],
        lr=lr, betas=(0.5, 0.9), weight_decay=5e-2,
    )
    criterion = nn.BCEWithLogitsLoss(torch.tensor([1.0]))

    rng = np.random.default_rng(0)
    raw_bags = [rng.standard_normal((n, d)).astype(np.float32)
                for _ in range(bags)]
    labels = rng.integers(0, 2, bags).astype(np.float32)

    def one_bag(feats_np, label):
        # train.py:251-257: l2norm + (dropout_patches p=0 is identity) + tensorize
        feats_np = feats_np / np.linalg.norm(feats_np, axis=1, keepdims=True)
        bag_label = torch.FloatTensor(np.array([label]))
        bag_feats = torch.FloatTensor(np.array([feats_np]))
        # _run_model (train.py:828-846)
        ins_pred, bag_pred, _ = milnet(bag_feats)
        max_pred, _ = torch.max(ins_pred, 1) if ins_pred.dim() == 3 else torch.max(ins_pred, 0)
        bag_loss = criterion(bag_pred.view(1, -1), bag_label.view(1, -1))
        max_loss = criterion(max_pred.view(1, -1), bag_label.view(1, -1))
        loss = w * bag_loss + (1 - w) * max_loss
        loss.backward()
        # _after_run_model_in_training_mode (train.py:468-473, 852-854)
        optimizer.step()
        optimizer.zero_grad()
        w.data.clamp_(0, 1)
        return float(loss.item())

    one_bag(raw_bags[0], labels[0])  # warmup

    t0 = time.perf_counter()
    for it in range(iters):
        for b in range(bags):
            one_bag(raw_bags[b], labels[b])
    dt = time.perf_counter() - t0
    bps = bags * iters / dt

    print(f"reference torch-CPU hot loop: {bps:.3f} bags/s "
          f"({dt / (bags * iters) * 1e3:.1f} ms/bag, N={n}, d={d})")

    path = "BASELINE.json"
    with open(path) as f:
        base = json.load(f)
    base.setdefault("measured", {})["reference_mil_train_bags_per_sec"] = {
        "value": round(bps, 3),
        "unit": "bags/s (fwd+bwd+opt, N=10000, d=384, depth=2, torch-CPU)",
        "hardware": "torch CPU (no CUDA in container); reference hot loop train.py:249-262",
        "config": {"n": n, "d": d, "big_lambda": 512, "depth": 2, "heads": 4},
    }
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
        f.write("\n")
    print(f"wrote measured baseline to {path}")


if __name__ == "__main__":
    main()
