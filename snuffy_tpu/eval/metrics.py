"""Evaluation metrics: ROC/AUC with optimal thresholds, accuracy, ECE.

Pure-numpy/sklearn host-side functions; semantics follow reference
utils.py:253-294 (multi_label_roc / optimal_thresh) and metrics.py:7-95
(binned Expected Calibration Error), so parity runs produce directly
comparable numbers.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from sklearn.metrics import roc_auc_score, roc_curve


def optimal_thresh(fpr, tpr, thresholds, p: float = 0.0):
    """Threshold minimizing (fpr − tpr) − p·tpr/(fpr+tpr+1)
    (reference utils.py:291-294)."""
    loss = (fpr - tpr) - p * tpr / (fpr + tpr + 1)
    idx = np.argmin(loss, axis=0)
    return fpr[idx], tpr[idx], thresholds[idx]


def multi_label_roc(
    labels: np.ndarray,
    predictions: np.ndarray,
    num_classes: int,
    for_feats: bool = False,
) -> Tuple[List[float], List[np.ndarray], List[float]]:
    """Per-class AUC + optimal thresholds (reference utils.py:253-276)."""
    thresholds, thresholds_optimal, aucs = [], [], []
    if predictions.ndim == 1 and not for_feats:
        predictions = predictions[:, None]
    for c in range(num_classes):
        if for_feats:
            label, prediction = labels, predictions
        else:
            label, prediction = labels[:, c], predictions[:, c]
        fpr, tpr, threshold = roc_curve(label, prediction, pos_label=1)
        _, _, threshold_optimal = optimal_thresh(fpr, tpr, threshold)
        aucs.append(roc_auc_score(label, prediction))
        thresholds.append(threshold)
        thresholds_optimal.append(threshold_optimal)
    return aucs, thresholds, thresholds_optimal


def compute_accuracy(
    labels: np.ndarray,
    predictions: np.ndarray,
    thresholds_optimal: Sequence[float],
    num_classes: int,
) -> float:
    """Thresholded bag accuracy (reference train.py:487-505)."""
    labels = np.asarray(labels)
    predictions = np.array(predictions, copy=True)
    if num_classes == 1:
        predictions = predictions.reshape(len(predictions))
        binary = (predictions >= thresholds_optimal[0]).astype(float)
        labels = np.squeeze(labels)
        return float(np.mean(labels == binary))
    for i in range(num_classes):
        predictions[:, i] = (predictions[:, i] >= thresholds_optimal[i]).astype(
            float
        )
    score = sum(
        np.array_equal(labels[i], predictions[i]) for i in range(len(labels))
    )
    return float(score / len(labels))


def compute_pos_weight(labels):
    """BCE positive-class weight for unbalanced MIL datasets (reference
    utils.py:499-507). The reference accumulates `np.clip(label, 0, 1)`
    ELEMENTWISE, so one-hot multiclass labels yield a per-class weight
    vector (e.g. TCGA: every bag positive for one class → weight 1.0 per
    class, NOT the degenerate scalar 0 a flat sum would give). Scalar
    binary labels yield a scalar."""
    pos_count = None
    for label in labels:
        arr = np.clip(np.asarray(label, np.float64), 0, 1)
        pos_count = arr if pos_count is None else pos_count + arr
    # Degenerate split guard: a train split (or class) with ZERO positive
    # bags would give (n-0)/0 = inf and NaN BCE (inf·0) from step 1. The
    # reference hits the same division (utils.py:499-507) but only ever
    # ran on splits with positives; weight 1.0 (unweighted) is the only
    # sane value when the positive class is absent.
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(
            pos_count > 0, (len(labels) - pos_count) / pos_count, 1.0
        )
    return float(out) if np.ndim(out) == 0 else out.astype(np.float32)


def ece_loss(
    output: np.ndarray,
    labels: np.ndarray,
    threshold: float = 0.5,
    n_bins: int = 15,
    logits: bool = True,
) -> float:
    """Binned Expected Calibration Error (reference metrics.py:7-95).

    output: (n, C) probabilities (or logits when logits=True).
    Confidence = max class probability, flipped to ≥0.5 for the binary case;
    accuracy = exact thresholded-prediction match; ECE = Σ_b prop_b·|conf_b −
    acc_b| over equal-width bins.
    """
    output = np.asarray(output, dtype=np.float64)
    if output.ndim == 1:
        output = output[:, None]
    labels = np.asarray(labels)
    if logits:
        e = np.exp(output - output.max(axis=1, keepdims=True))
        probabilities = e / e.sum(axis=1, keepdims=True)
    else:
        probabilities = output

    confidences = probabilities.max(axis=1)
    confidences = np.where(confidences < 0.5, 1.0 - confidences, confidences)
    predictions = (probabilities >= threshold).astype(float)
    # per-element (not exact-match) accuracy matrix: the in-bin mean then
    # averages over classes, matching reference metrics.py:41-46,76-78
    accuracies = np.equal(predictions, labels.reshape(predictions.shape))

    bin_boundaries = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    for lo, hi in zip(bin_boundaries[:-1], bin_boundaries[1:]):
        in_bin = (confidences > lo) & (confidences <= hi)
        prop = float(np.mean(in_bin))
        if prop > 0:
            acc = float(np.mean(accuracies[in_bin]))  # mean over rows+classes
            conf = float(np.mean(confidences[in_bin]))
            ece += prop * abs(conf - acc)
    return float(ece)
