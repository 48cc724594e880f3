"""Fused dense self-attention kernel (long-token ViTs, e.g. S/8):
kernel-vs-einsum parity (Pallas interpret mode on CPU), the custom-vjp
gradient route, and the VMEM block sizing."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.ops.experimental.dense_attention import (
    _einsum_reference,
    _kernel_call,
    _pick_bz,
    fused_self_attention,
)


def test_kernel_matches_einsum_interpret():
    z, n, dk = 4, 300, 64  # pads to 384; n_valid masks 20 tail keys
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)
    ref = _einsum_reference(q, k, v, 280, dk ** -0.5)
    out = _kernel_call(q, k, v, 280, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:, :280], 
                               np.asarray(ref)[:, :280], rtol=1e-5,
                               atol=1e-5)


def test_custom_vjp_matches_einsum_grads():
    z, n, dk = 2, 192, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((z, n, dk)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.tanh(fused_self_attention(q, k, v, n)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(_einsum_reference(q, k, v, n, dk ** -0.5)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_pick_bz_respects_vmem_budget():
    assert _pick_bz(384, 896) == 2      # ViT-S/8 at batch 64: 2 heads/step
    assert _pick_bz(384, 256) * 256 * 256 <= 2 << 20
    assert _pick_bz(6, 2048) == 1       # huge n: fall to single
