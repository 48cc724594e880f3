"""Public model API shim — the reference exposes the binary Snuffy model as
module `snuffy` (reference snuffy.py:34-238). The TPU-native classes live in
snuffy_tpu.models.snuffy; this module re-exports them under the same names.

Construction differs deliberately: instead of hand-assembling cloned
attn/ff modules (reference train.py:861-890), pass one `SnuffyModelConfig`:

    from snuffy import MILNet, SnuffyModelConfig
    model = MILNet(SnuffyModelConfig(feats_size=384, big_lambda=500,
                                     random_patch_share=0.5, num_heads=4))
    params = init_milnet_params(model.cfg)
    ins_logits, bag_logits, p_attn = model.apply(
        {'params': params}, feats, mask, True,
        rngs={'sparse': jax.random.PRNGKey(0)})
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

__all__ = [
    "SnuffyModelConfig",
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
