"""Typed configuration system shared across all pipeline stages.

The reference scatters ~35 argparse flags per entry point (reference
train.py:54-135); here every stage consumes one of these dataclasses, and the
CLI layers (train.py, compute_feats.py, ...) parse reference-compatible flags
into them — including the composite literal-eval'd "sweep" flags
(reference train.py:1008-1011).
"""

from __future__ import annotations

import ast
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

HISTOPATHOLOGY_DATASETS = ("camelyon16", "tcga")
MIL_DATASETS = ("musk1", "musk2", "elephant")

# MIL benchmark feature widths auto-selected by dataset
# (mirrors reference train.py:992-999).
MIL_DATASET_FEATS_SIZE = {"musk1": 166, "musk2": 166, "elephant": 230}


@dataclass(frozen=True)
class SnuffyModelConfig:
    """Architecture of the Snuffy sparse-transformer MIL model.

    Semantics follow reference snuffy.py / snuffy_multiclass.py; shapes are
    static (bags padded + masked) so every forward maps onto one XLA program.
    """

    feats_size: int = 512
    num_classes: int = 1
    num_heads: int = 6
    big_lambda: int = 200          # Λ: number of attended (selected) tokens
    random_patch_share: float = 0.0  # ρ: fraction of Λ sampled uniformly
    mlp_multiplier: int = 4
    encoder_dropout: float = 0.0   # residual-branch + FFN dropout
    attention_dropout: float = 0.1  # dropout on attention probabilities
    activation: str = "relu"
    depth: int = 1
    multiclass: bool = False       # snuffy_multiclass.py selection semantics
    weight_init_i: str = "xavier_normal"
    weight_init_b: str = "xavier_normal"
    use_pallas: bool = True        # use the Pallas sparse-attention kernel on TPU
    # N-axis tile of the Pallas kernel; 2048 measured fastest at the
    # Camelyon16 operating point (N_pad 10240) on v5e, see tools/bench_ab.py.
    pallas_tile_n: int = 2048
    param_dtype: str = "float32"
    # activation/matmul dtype; params and losses stay float32. 'bfloat16'
    # is the TPU-native choice (MXU runs bf16 at 2x float32 throughput).
    compute_dtype: str = "float32"
    # rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(depth) less activation HBM — enables
    # training on ultra-long bags (N >> 10k) on a single chip.
    remat: bool = False

    @property
    def top_share(self) -> float:
        return 1.0 - self.random_patch_share

    @property
    def k_top(self) -> int:
        """Static top-Λ share count: ceil(Λ·(1−ρ))."""
        import math

        return math.ceil(self.big_lambda * self.top_share)

    @property
    def k_rand(self) -> int:
        """Static random-share count: int(Λ·ρ)."""
        return int(self.big_lambda * self.random_patch_share)


@dataclass(frozen=True)
class OptimizerConfig:
    optimizer: str = "adam"        # adam | adamw
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.5, 0.9)
    weight_decay: float = 5e-3
    eta_min: float = 5e-6
    scheduler: str = "cosine"      # cosine | cosinewarmup | none
    clip_grad: Optional[float] = None
    single_weight_lr_multiplier: float = 0.1


@dataclass(frozen=True)
class MILTrainConfig:
    """MIL training runtime config (reference train.py Trainer/Runner)."""

    model: SnuffyModelConfig = field(default_factory=SnuffyModelConfig)
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    num_epochs: int = 200
    dataset: str = "camelyon16"
    embedding: str = "SimCLR"
    split: float = 0.2
    dropout_patch: float = 0.0
    l2normed_embeddings: bool = False
    soft_average: bool = False     # learn the bag/instance loss-mixing weight
    num_processes: int = 8
    use_mp: bool = True
    bins: int = 10                 # ECE calibration bins
    seed: int = 1
    arch: str = "snuffy"
    # MIL-dataset cross validation (musk1/musk2/elephant)
    cv_num_folds: int = 10
    cv_current_fold: int = 0
    cv_valid_ratio: float = 0.2
    # Batched-bags mode: 0/1 keeps the reference per-bag-step semantics;
    # >1 averages grads over a batch of bags (the data-parallel unit on TPU).
    bag_batch_size: int = 1
    # Batched-step implementation (single-device): 'packed' folds the batch
    # along the row axis so every GEMM runs at M=B·N — the MIL shapes are
    # M-bound (ROOFLINE.md §1/§3) and the unbatched graph avoids the vmap
    # backward-schedule penalty (ROUND3.md); 'vmap' maps the per-bag graph
    # over the batch (the r3 implementation). Semantics are identical
    # (per-bag losses, one averaged-grad update); only the execution layout
    # differs. Mesh runs use the sharded step regardless.
    bag_batch_impl: str = "packed"
    # Multi-chip MIL training (batched mode only): None = auto (dp-only
    # mesh when bag_batch_size divides over the chips), 1 = full dp×sp×tp
    # factoring (loud validation), 0 = never (single device).
    use_mesh: Optional[int] = None
    # Paths (reference train.py:41-47)
    embeddings_path: str = "embeddings/"
    save_path: str = "runs/"
    camelyon16_reference: str = "datasets/camelyon16/reference.csv"
    camelyon16_mask_path: str = "datasets/camelyon16/masks"
    run_name: Optional[str] = None
    # ROC dump (reference train.py:365-372: saves labels+predictions npz
    # under ROC_PATH/<roc_run_name>/<roc_run_epoch>.npz)
    roc_path: str = "roc/"
    roc_run_name: Optional[str] = None
    roc_run_epoch: Optional[int] = None
    roc_data_split: str = "test"

    @property
    def for_roc_curve(self) -> bool:
        """Derived exactly as the reference derives it (reference
        train.py:985-990): BOTH --roc_run_name and --roc_run_epoch set."""
        return self.roc_run_name is not None and self.roc_run_epoch is not None


def parse_literal_flag(value):
    """Parse the reference's composite sweep flags (lists encoded as strings),
    e.g. --betas='[0.5, 0.9]' (reference train.py:1008-1011)."""
    if isinstance(value, (list, tuple)):
        return value
    return ast.literal_eval("".join(value))


def bool_flag(s):
    """Boolean CLI parser (reference dino_adapter/utils.py:206-218).

    `type=bool` silently maps every non-empty string — including "False" —
    to True; this parser accepts on/off/true/false/0/1 and rejects anything
    else, so `--norm_last_layer false` actually turns the flag off."""
    import argparse

    if isinstance(s, bool):
        return s
    low = str(s).lower()
    if low in ("off", "false", "0"):
        return False
    if low in ("on", "true", "1"):
        return True
    raise argparse.ArgumentTypeError("invalid value for a boolean flag")


def replace(cfg, **kw):
    """dataclasses.replace, re-exported for CLI convenience."""
    return dataclasses.replace(cfg, **kw)


def resolve_feats_size(dataset: str, feats_size: int) -> int:
    """MIL datasets force their own feature width (reference train.py:992-999)."""
    return MIL_DATASET_FEATS_SIZE.get(dataset, feats_size)
