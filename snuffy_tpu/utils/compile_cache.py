"""Persistent XLA compilation cache, repo-local.

The axon relay pays a fresh multi-10s remote compile per program PER
PROCESS — but jax's persistent cache works through it (measured 1.58 s →
0.06 s across processes for a probe program). Enabling it turns every
re-run of bench.py / the profiling tools / the CLIs from compile-bound to
measurement-bound: the driver's end-of-round bench run hits the cache the
final in-round run warmed.

Content-addressed (HLO + compile flags + backend key), so stale entries
are impossible — a changed program simply misses.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after first device use."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min_compile_time (1 s) keeps trivial programs out of the
        # cache; everything the relay makes slow is far above it
    except Exception:
        pass  # older jax without the option: compile as before
