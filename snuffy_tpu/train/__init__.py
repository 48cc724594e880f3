from snuffy_tpu.train.losses import bce_with_logits, mixed_mil_loss
from snuffy_tpu.train.schedules import make_epoch_schedule
from snuffy_tpu.train.trainer import MILTrainState, SnuffyTrainer
from snuffy_tpu.train.runner import Runner
from snuffy_tpu.train.checkpoint import (  # noqa: F401
    ShardedCheckpointManager,
    restore_sharded,
    save_sharded,
)
