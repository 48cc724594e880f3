"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding paths are validated on virtual CPU devices
(`--xla_force_host_platform_device_count`), per the reference test strategy
gap analysis (SURVEY.md §4): the reference has no tests at all; we test every
layer, including mesh code, without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the container's sitecustomize imports jax
# at interpreter start (before this conftest), so jax's config snapshotted
# JAX_PLATFORMS from the outer environment. Force the CPU platform through
# the live config instead.
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float64-ish numpy oracles; the backend default
# (bf16-class matmul inputs) is a deliberate runtime speed choice, not a
# correctness one.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache (content-addressed, stale-proof): jit compiles
# recur identically across suite runs; caching them shaves minutes.
from snuffy_tpu.utils.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
