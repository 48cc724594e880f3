"""snuffy_tpu — a TPU-native whole-slide-image MIL classification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Snuffy
reference (ECCV 2024, arXiv:2408.08258): slide tiling, SSL embedder
(continual) pretraining, patch feature extraction, sparse-transformer MIL
training, and evaluation/visualization — built TPU-first with static shapes,
mask-based ragged-bag handling, `jax.sharding` meshes for multi-chip scale,
and Pallas kernels on the hot attention path.
"""

__version__ = "0.1.0"

from snuffy_tpu import configs  # noqa: F401
