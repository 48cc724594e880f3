"""Epoch orchestration: data prep, metrics, checkpointing, best-AUC tracking.

Counterpart of the reference `Runner` (reference train.py:523-794):
  * loads histopathology bag CSVs or classic-MIL pickles;
  * per epoch: train → valid, tracks the best-valid-AUC epoch;
  * saves per-epoch checkpoints + optimal-threshold JSON side files
    (train.py:643-675), reloads them for testing at the best and last
    epochs (train.py:752-778), and deletes non-special epochs at the end
    (train.py:780-794).

TPU-first differences: checkpoints are flax-serialization msgpack (not
pickle); all per-epoch device work happens in a handful of bucket-level XLA
programs (see trainer.py) instead of per-bag dispatches.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
from flax import serialization

from snuffy_tpu.configs import MILTrainConfig
from snuffy_tpu.data.bags import dropout_patches, l2_normalize_rows
from snuffy_tpu.data.bucketing import DEFAULT_BUCKETS, pad_bag
from snuffy_tpu.eval.metrics import (
    compute_accuracy,
    compute_pos_weight,
    ece_loss,
    multi_label_roc,
)
from snuffy_tpu.train.trainer import MILTrainState, SnuffyTrainer
from snuffy_tpu.utils.logging import MetricsLogger


BagTuple = Tuple[List[np.ndarray], List[np.ndarray], Optional[list], Optional[list]]


def bucket_bags(
    labels: List[np.ndarray],
    feats: List[np.ndarray],
    l2norm: bool = False,
    dropout_patch: float = 0.0,
    rng: Optional[np.random.Generator] = None,
    buckets=DEFAULT_BUCKETS,
) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Group bags by bucket length → {n_pad: (feats, masks, labels, index)}.

    Applies the reference's per-bag preprocessing: optional row L2-norm
    (train.py:251-252) and dropout_patches augmentation (train.py:253).
    """
    rng = rng or np.random.default_rng()
    groups: Dict[int, list] = {}
    for i, (lab, f) in enumerate(zip(labels, feats)):
        f = np.asarray(f, np.float32)
        if l2norm:
            f = l2_normalize_rows(f)
        if dropout_patch > 0:
            f = dropout_patches(f, dropout_patch, rng)
        padded, mask = pad_bag(f, buckets)
        groups.setdefault(padded.shape[0], []).append(
            (padded, mask, np.asarray(lab, np.float32), i)
        )
    out = {}
    for n_pad, items in groups.items():
        fs, ms, ls, idx = zip(*items)
        out[n_pad] = (
            np.stack(fs),
            np.stack(ms),
            np.stack(ls),
            np.asarray(idx, np.int64),
        )
    return out


class Runner:
    """Training driver for one run (reference train.py:523-794)."""

    def __init__(
        self,
        cfg: MILTrainConfig,
        trainer: SnuffyTrainer,
        train_data: BagTuple,
        valid_data: BagTuple,
        test_data: BagTuple,
        logger: Optional[MetricsLogger] = None,
    ):
        self.cfg = cfg
        self.trainer = trainer
        self.train_data = train_data
        self.valid_data = valid_data
        self.test_data = test_data
        self.logger = logger or MetricsLogger()
        self.rng = np.random.default_rng(cfg.seed)

        # Weighted BCE from the train split — the reference sets it
        # UNCONDITIONALLY on the first train epoch (train.py:244-247), for
        # every dataset; gating it to the classic-MIL pickles was a parity
        # bug that only stayed invisible because camelyon16 splits are
        # near-balanced (pos_weight ≈ 1).
        trainer.pos_weight = compute_pos_weight(train_data[0])

        self.save_dir = os.path.join(
            cfg.save_path, cfg.dataset, cfg.run_name or f"run_seed{cfg.seed}"
        )
        os.makedirs(self.save_dir, exist_ok=True)

        self.best_auc = -1.0
        self.best_epoch = -1
        self.best_thresholds: Optional[list] = None
        self.best_feats_thresholds: Optional[list] = None

    # ---------------------------------------------------------------- epochs

    def _epoch_metrics(self, labels, scores, ins_list, feats_labels, order, prefix):
        labels_arr = np.stack([np.asarray(l) for l in labels])[order]
        num_classes = self.cfg.model.num_classes
        aucs, _, th_opt = multi_label_roc(labels_arr, scores, num_classes)
        acc = compute_accuracy(labels_arr, scores, th_opt, num_classes)
        res = {
            f"{prefix}_accuracy": acc,
            f"{prefix}_aucs": [float(a) for a in aucs],
            f"{prefix}_thresholds_optimal": [float(t) for t in th_opt],
        }
        if feats_labels is not None:
            flat_labels = np.concatenate(
                [np.asarray(feats_labels[i]) for i in order]
            ).astype(float)
            flat_scores = np.concatenate([s.reshape(-1) for s in ins_list])
            f_aucs, _, f_th = multi_label_roc(
                flat_labels, flat_scores, num_classes, for_feats=True
            )
            f_acc = float(np.mean((flat_scores >= f_th[0]).astype(int) == flat_labels))
            res.update(
                {
                    f"{prefix}_feat_accuracy": f_acc,
                    f"{prefix}_feat_aucs": [float(a) for a in f_aucs],
                    f"{prefix}_feat_thresholds_optimal": [float(t) for t in f_th],
                }
            )
        return res

    def train_one_epoch(self, state: MILTrainState, epoch: int, lr: float):
        labels, feats = self.train_data[0], self.train_data[1]
        bucketed = bucket_bags(
            labels,
            feats,
            l2norm=self.cfg.l2normed_embeddings,
            dropout_patch=self.cfg.dropout_patch,
            rng=self.rng,
        )
        state, losses, scores, ins_list, order = self.trainer.run_train_epoch(
            state, bucketed, lr, self.rng, self.cfg.seed
        )
        res = self._epoch_metrics(
            labels, scores, ins_list, self.train_data[2], order, "epoch_train"
        )
        res["epoch_train_loss"] = float(np.mean(losses))
        return state, res

    def evaluate(
        self,
        state: MILTrainState,
        data: BagTuple,
        epoch: int,
        prefix: str,
        predefined_thresholds: Optional[list] = None,
        predefined_feats_thresholds: Optional[list] = None,
    ):
        labels, feats = data[0], data[1]
        bucketed = bucket_bags(
            labels, feats, l2norm=self.cfg.l2normed_embeddings, rng=self.rng
        )
        losses, scores, ins_list, order = self.trainer.run_eval_epoch(
            state, bucketed, self.cfg.seed + epoch
        )
        res = self._epoch_metrics(labels, scores, ins_list, data[2], order, prefix)
        res[f"{prefix}_loss"] = float(np.mean(losses))
        if predefined_thresholds is not None:
            labels_arr = np.stack([np.asarray(l) for l in labels])[order]
            acc = compute_accuracy(
                labels_arr, scores, predefined_thresholds, self.cfg.model.num_classes
            )
            res[f"{prefix}_accuracy"] = acc
        # ECE calibration on the mixed sigmoid scores (train.py:415-451).
        labels_arr = np.stack([np.asarray(l) for l in labels])[order]
        res[f"{prefix}_ece"] = ece_loss(
            scores, labels_arr, 0.5, n_bins=self.cfg.bins, logits=False
        )

        # ROC curve dump. The reference's gate is the derived
        # `for_roc_curve = roc_run_name is not None and roc_run_epoch is not
        # None` (reference train.py:365-372, 985-990) — BOTH flags required,
        # and the file is named after --roc_run_epoch, not the live epoch.
        if self.cfg.for_roc_curve and self.cfg.roc_data_split in prefix:
            roc_dir = os.path.join(self.cfg.roc_path, self.cfg.roc_run_name)
            os.makedirs(roc_dir, exist_ok=True)
            np.savez(
                os.path.join(roc_dir, f"{self.cfg.roc_run_epoch}.npz"),
                labels=labels_arr,
                predictions=scores,
            )

        # CAMELYON16 FROC localization at test time (train.py:336-349,
        # 392-410): instance scores above the optimal feat threshold become
        # level-0 detections at patch centers.
        is_test = "test" in prefix
        slide_names = data[4] if len(data) > 4 else None
        if (
            is_test
            and self.cfg.dataset == "camelyon16"
            and data[3] is not None
            and slide_names is not None
            and os.path.isdir(self.cfg.camelyon16_mask_path)
            and os.path.exists(self.cfg.camelyon16_reference)
        ):
            feat_th = (
                predefined_feats_thresholds[0]
                if predefined_feats_thresholds
                else res.get(f"{prefix}_feat_thresholds_optimal", [0.5])[0]
            )
            res[f"{prefix}_challenge_froc_score"] = self._camelyon16_froc(
                data, ins_list, order, feat_th
            )
        return res

    def _camelyon16_froc(self, data, ins_list, order, feat_threshold):
        """Build per-slide detections and score them against the official
        masks (reference train.py:347-349 detection construction:
        x = col·512 + 256, y = row·512 + 256 at WSI level 0)."""
        import pandas as pd

        from snuffy_tpu.eval.froc import froc_for_slides

        positions, names = data[3], data[4]
        detections, types = {}, {}
        ref = pd.read_csv(self.cfg.camelyon16_reference)
        type_by_image = {
            os.path.splitext(str(r["image"]))[0]: str(r["type"]).lower()
            for _, r in ref.iterrows()
        }
        for j, bag_idx in enumerate(order):
            slide = names[bag_idx]
            scores_j = np.asarray(ins_list[j]).reshape(-1)
            dets = []
            for pos_str, prob in zip(positions[bag_idx], scores_j):
                if prob <= feat_threshold:
                    continue
                m = re.search(r"[^\d]*(\d+)[^\d]*(\d+)", str(pos_str))
                if not m:
                    continue
                col, row = int(m.group(1)), int(m.group(2))
                dets.append((float(prob), col * 512 + 256, row * 512 + 256))
            detections[slide] = dets
            types[slide] = type_by_image.get(slide, "tumor")

        score, avg_fps, sens = froc_for_slides(
            detections,
            lambda s: os.path.join(
                self.cfg.camelyon16_mask_path, f"{s}_mask.tif"
            ),
            types,
            evaluation_mask_level=5,
        )
        return score

    # ----------------------------------------------------------- checkpoints

    def _ckpt_path(self, epoch) -> str:
        return os.path.join(self.save_dir, f"{epoch}.msgpack")

    def save_checkpoint(self, state: MILTrainState, epoch: int, valid_res: dict):
        payload = {
            "params": state.params,
            "w": state.w,
            "step": state.step,
        }
        with open(self._ckpt_path(epoch), "wb") as f:
            f.write(serialization.to_bytes(payload))
        thresholds = {
            "epoch": epoch,
            "auc": valid_res.get("epoch_valid_aucs"),
            "thresholds_optimal": valid_res.get("epoch_valid_thresholds_optimal"),
            "feats_thresholds_optimal": valid_res.get(
                "epoch_valid_feat_thresholds_optimal"
            ),
            "single_weight_parameter": float(np.asarray(state.w)),
        }
        with open(
            os.path.join(self.save_dir, f"thresholds_{epoch}.txt"), "w"
        ) as f:
            json.dump(thresholds, f)

    def load_checkpoint(self, state: MILTrainState, epoch: int) -> MILTrainState:
        template = {"params": state.params, "w": state.w, "step": state.step}
        with open(self._ckpt_path(epoch), "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        return MILTrainState(
            payload["params"], payload["w"], state.opt_state, payload["step"]
        )

    def load_thresholds(self, epoch: int) -> dict:
        with open(os.path.join(self.save_dir, f"thresholds_{epoch}.txt")) as f:
            return json.load(f)

    def clean_up(self, keep_epochs):
        """Delete non-special epoch checkpoints (reference train.py:780-794)."""
        keep = {f"{e}.msgpack" for e in keep_epochs} | {
            f"thresholds_{e}.txt" for e in keep_epochs
        }
        for fname in os.listdir(self.save_dir):
            if fname not in keep and (
                fname.endswith(".msgpack") or fname.startswith("thresholds_")
            ):
                os.remove(os.path.join(self.save_dir, fname))

    # ------------------------------------------------------------------ run

    def run(self, schedule) -> dict:
        """Full training run. `schedule`: epoch → lr. Returns summary dict."""
        cfg = self.cfg
        state = self.trainer.init_state(cfg.seed)
        history = []
        for epoch in range(1, cfg.num_epochs + 1):
            t0 = time.time()
            lr = schedule(epoch - 1)
            state, train_res = self.train_one_epoch(state, epoch, lr)
            valid_res = self.evaluate(state, self.valid_data, epoch, "epoch_valid")
            elapsed = time.time() - t0
            row = {"epoch": epoch, "lr": lr, "time_s": elapsed}
            row.update(train_res)
            row.update(valid_res)
            history.append(row)
            self.logger.log(row)

            self.save_checkpoint(state, epoch, valid_res)
            auc = float(np.mean(valid_res["epoch_valid_aucs"]))
            if auc > self.best_auc:
                self.best_auc = auc
                self.best_epoch = epoch
                self.best_thresholds = valid_res["epoch_valid_thresholds_optimal"]
                self.best_feats_thresholds = valid_res.get(
                    "epoch_valid_feat_thresholds_optimal"
                )

        summary = {
            "best_epoch": self.best_epoch,
            "best_valid_auc": self.best_auc,
            "history": history,
        }

        # Test at best-AUC and last epochs (reference train.py:752-778).
        for tag, epoch in (("best", self.best_epoch), ("last", cfg.num_epochs)):
            if epoch < 1:
                continue
            th = self.load_thresholds(epoch)
            test_state = self.load_checkpoint(state, epoch)
            test_res = self.evaluate(
                test_state,
                self.test_data,
                epoch,
                f"epoch_test_{tag}",
                predefined_thresholds=th.get("thresholds_optimal"),
                predefined_feats_thresholds=th.get("feats_thresholds_optimal"),
            )
            self.logger.log(test_res)
            summary[f"test_{tag}"] = test_res

        with open(os.path.join(self.save_dir, "summary.json"), "w") as f:
            json.dump(summary, f, default=float)
        self.clean_up({self.best_epoch, cfg.num_epochs})
        return summary
