"""Metrics logging with a wandb-compatible key schema.

The reference logs flat dicts whose keys get reshaped into wandb sections
(reference utils.py:29-56 `to_wandb_format`: 'epoch_train_loss' →
'train/epoch/loss', per-class AUC lists → one key per class). We reproduce
that schema so dashboards line up, but log to JSONL on disk by default —
wandb itself is optional and degrades to a no-op when unavailable.
"""

from __future__ import annotations

import json
import os
from typing import Optional


def to_wandb_format(d: dict) -> dict:
    """'epoch_train_loss' → 'train/epoch/loss'; list values become one key
    per class ('.../aucs' → '.../auc_0', ...)."""
    out = {}
    for key, value in d.items():
        parts = key.split("_")
        if len(parts) >= 3 and parts[0] in ("epoch", "step"):
            granularity, mode, metric = parts[0], parts[1], "_".join(parts[2:])
            new_key = f"{mode}/{granularity}/{metric}"
        else:
            new_key = key
        if isinstance(value, (list, tuple)):
            for i, v in enumerate(value):
                out[f"{new_key.rstrip('s')}_{i}"] = v
        else:
            out[new_key] = value
    return out


def truncate_log_past_epoch(path: str, resume_epoch: int,
                            epoch_key: str = "epoch") -> int:
    """On resume, drop JSONL rows from epochs ≥ resume_epoch so the metric
    stream holds each epoch exactly once — the JSONL equivalent of the
    reference's wandb-history replay, which re-logs history for epochs
    before the resume point and discards everything after it (reference
    dino_adapter/main_dino_adapter.py:383-446,
    mae_adapter/main_pretrain_adapter.py:223-276).

    Rows without `epoch_key` (or unparsable lines) are kept. Returns the
    number of rows dropped."""
    if not os.path.exists(path):
        return 0
    kept, dropped = [], 0
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                row = json.loads(line)
                if isinstance(row, dict) and epoch_key in row and (
                    int(row[epoch_key]) >= resume_epoch
                ):
                    dropped += 1
                    continue
            except (ValueError, TypeError):
                pass
            kept.append(line if line.endswith("\n") else line + "\n")
    if dropped:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(kept)
        os.replace(tmp, path)
    return dropped


class MetricsLogger:
    """JSONL metrics sink with optional wandb mirroring."""

    def __init__(self, path: Optional[str] = None, use_wandb: bool = False):
        self.path = path
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self._wandb = wandb
            except ImportError:
                self._wandb = None

    def log(self, metrics: dict):
        formatted = to_wandb_format(metrics)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(formatted, default=float) + "\n")
        if self._wandb is not None and getattr(self._wandb, "run", None):
            self._wandb.log(formatted)
