from snuffy_tpu.eval.metrics import (  # noqa: F401
    multi_label_roc,
    optimal_thresh,
    ece_loss,
    compute_accuracy,
)
