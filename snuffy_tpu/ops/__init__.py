from snuffy_tpu.ops.selection import (  # noqa: F401
    top_share_selection,
    gumbel_without_replacement,
    binary_lambda_selection,
    multiclass_lambda_selection,
)
from snuffy_tpu.ops.sparse_attention import (  # noqa: F401
    inverted_sparse_attention,
)

# Measured-but-unwired primitives live in snuffy_tpu.ops.experimental
# (batched_rows, dense_attention) — see its docstring for the A/B evidence.
