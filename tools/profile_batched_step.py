"""Ablate the batched-bags train step to locate the per-bag penalty vs the
serial scan (VERDICT r2 next-5, continued).

Two traps already hit and avoided here (CLAUDE.md):
  * standalone gather/scatter probes are dispatch-floor artifacts — the
    flat-under-vmap row ops A/B'd to ZERO change in the full program;
  * fetching non-scalar outputs (grads!) times the host link, not the
    chip — every variant below returns scalars only (grads folded into a
    sum so XLA cannot dead-code the backward pass).

Operating point: B=8, N=10240, d=384, Λ=1024 (big_lambda 512 + equal
random share), depth=2, bf16. Run on the real chip.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
from snuffy_tpu.train.trainer import SnuffyTrainer

B, N, NV, D = 8, 10240, 10000, 384
ITERS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt * 1e3:8.1f} ms  ({B / dt:6.1f} bags/s)",
          flush=True)
    return dt


def grads_scalar(grads):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda g: jnp.sum(g.astype(jnp.float32)),
                               grads),
    )


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    masks = jnp.asarray(np.arange(N)[None] < NV).repeat(B, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    for pallas in (True, False):
        cfg = MILTrainConfig(
            model=SnuffyModelConfig(
                feats_size=D, num_heads=4, big_lambda=512,
                random_patch_share=0.5, activation="gelu", depth=2,
                compute_dtype="bfloat16", use_pallas=pallas,
            ),
            optim=OptimizerConfig(optimizer="adamw", lr=2e-2),
            soft_average=True,
        )
        trainer = SnuffyTrainer(cfg)
        state = trainer.init_state(0, example_n=N)
        group = {"model": state.params, "w": state.w}
        tag = "pallas" if pallas else "einsum"

        def one_loss(group, f, m, l, k):
            k1, k2 = jax.random.split(k)
            loss, _ = trainer._bag_loss_fn(
                group, f, m, l, {"sparse": k1, "dropout": k2}, False
            )
            return loss

        @jax.jit
        def fwd(group, feats, masks, labels, keys):
            return jax.vmap(
                lambda f, m, l, k: one_loss(group, f, m, l, k)
            )(feats, masks, labels, keys).sum()

        @jax.jit
        def fwdbwd(group, feats, masks, labels, keys):
            def mean_loss(group):
                return jax.vmap(
                    lambda f, m, l, k: one_loss(group, f, m, l, k)
                )(feats, masks, labels, keys).mean()

            val, grads = jax.value_and_grad(mean_loss)(group)
            return val + 0.0 * grads_scalar(grads)

        @jax.jit
        def serial(group, feats, masks, labels, keys):
            def body(carry, xs):
                f, m, l, k = xs
                val, g = jax.value_and_grad(
                    lambda gr: one_loss(gr, f, m, l, k)
                )(carry)
                carry = jax.tree_util.tree_map(
                    lambda p, u: p - 1e-9 * u, carry, g
                )
                return carry, val

            _, vals = jax.lax.scan(body, group,
                                   (feats, masks, labels, keys))
            return vals.sum()

        timeit(f"{tag}: vmapped fwd", fwd, group, feats, masks, labels,
               keys)
        timeit(f"{tag}: vmapped fwd+bwd", fwdbwd, group, feats, masks,
               labels, keys)
        timeit(f"{tag}: serial scan fwd+bwd", serial, group, feats, masks,
               labels, keys)


if __name__ == "__main__":
    main()
