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
