from snuffy_tpu.utils.logging import MetricsLogger, to_wandb_format
