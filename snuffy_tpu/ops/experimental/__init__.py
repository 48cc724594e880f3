"""Measured-but-unwired primitives, kept out of the load-bearing `ops`
surface (every export in `snuffy_tpu.ops` is wired into a model or
trainer; these are not).

Each module carries a STATUS note with the A/B evidence for why it is not
wired (`batched_rows`: flat-under-vmap scatters — zero in-model change;
`dense_attention`: fused n≈800 attention — wins standalone, ~0 end-to-end
because XLA fuses the einsum chain). They remain correct and tested
(tests/test_batched_rows.py, tests/test_dense_attention.py) for
hardware/shape regimes where the balance tips.
"""

from snuffy_tpu.ops.experimental.batched_rows import (  # noqa: F401
    gather_rows,
    scatter_set_rows,
)
from snuffy_tpu.ops.experimental.dense_attention import (  # noqa: F401
    fused_self_attention,
)
