"""Public model API shim for the multiclass Snuffy variant (reference
snuffy_multiclass.py:34-253). Same classes as `snuffy`; the multiclass
selection semantics (per-class top-k union + ref_dim random share,
reference snuffy_multiclass.py:130-160) are enabled with
`SnuffyModelConfig(multiclass=True)`.
"""

from snuffy_tpu.configs import SnuffyModelConfig
from snuffy_tpu.models.snuffy import (
    BClassifier,
    Encoder,
    EncoderLayer,
    FCLayer,
    MILNet,
    MultiHeadedAttention,
    PositionwiseFeedForward,
    build_milnet,
    init_milnet_params,
)


def multiclass_config(**kw) -> SnuffyModelConfig:
    kw.setdefault("multiclass", True)
    return SnuffyModelConfig(**kw)


__all__ = [
    "SnuffyModelConfig",
    "multiclass_config",
    "FCLayer",
    "BClassifier",
    "Encoder",
    "EncoderLayer",
    "MultiHeadedAttention",
    "PositionwiseFeedForward",
    "MILNet",
    "build_milnet",
    "init_milnet_params",
]
