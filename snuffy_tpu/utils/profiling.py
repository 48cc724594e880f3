"""Tracing & profiling: first-class instrumentation the reference lacks.

The reference only prints wall-clock times (SURVEY.md §5 "Tracing: none").
Here every pipeline stage can be wrapped in:

  * `StageTimer` — nested wall-clock scopes with a JSONL sink, the
    structured replacement for the reference's scattered prints
    (reference train.py:688-698, compute_feats.py:629-633);
  * `device_trace` — a `jax.profiler.trace` context that captures an XLA
    trace viewable in TensorBoard/Perfetto;
  * `annotate` — `jax.profiler.TraceAnnotation` for named host spans inside
    a device trace.

All no-op gracefully when profiling is disabled.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class StageTimer:
    """Nested named timers with aggregate stats and optional JSONL sink."""

    def __init__(self, sink_path: Optional[str] = None):
        self.sink_path = sink_path
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._stack = []

    @contextlib.contextmanager
    def stage(self, name: str):
        full = "/".join([*self._stack, name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[full] = self.totals.get(full, 0.0) + dt
            self.counts[full] = self.counts.get(full, 0) + 1
            if self.sink_path:
                os.makedirs(os.path.dirname(self.sink_path) or ".",
                            exist_ok=True)
                with open(self.sink_path, "a") as f:
                    f.write(json.dumps({"stage": full, "seconds": dt}) + "\n")

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / self.counts[name],
            }
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture an XLA device trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named host span inside a device trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
