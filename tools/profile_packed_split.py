"""Where does the packed batched step's residual per-bag gap vs serial go?

Times, pipelined (chained data-dependence, ONE fence per window): forward
only and forward+backward for the serial one-bag graph vs the packed B-bag
graph at the bench operating point. Splits the 0.83× per-bag ratio
(tools/profile_packed_bags.py, B=4) into fwd / bwd / step-glue.

Run: python tools/profile_packed_split.py [B]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig
from snuffy_tpu.models.snuffy import build_milnet
from snuffy_tpu.train.losses import mixed_mil_loss, packed_mixed_mil_loss
from snuffy_tpu.train.trainer import SnuffyTrainer

N_PAD, N_VALID, D = 10240, 10000, 384


# one calibrated-window implementation shared across the packed profilers
from profile_packed_bags import measure  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=D, num_heads=4, big_lambda=512,
            random_patch_share=0.5, activation="gelu", depth=2,
            compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2),
        soft_average=True, bag_batch_size=B, bag_batch_impl="packed",
        use_mesh=0,
    )
    tr = SnuffyTrainer(cfg)
    state = tr.init_state(0, example_n=N_PAD)
    group = {"model": state.params, "w": state.w}
    rng = np.random.default_rng(0)
    feats1 = jnp.asarray(rng.standard_normal((N_PAD, D)), jnp.float32)
    mask1 = jnp.asarray(np.arange(N_PAD) < N_VALID)
    label1 = jnp.ones((1,), jnp.float32)
    featsB = jnp.asarray(rng.standard_normal((B, N_PAD, D)), jnp.float32)
    maskB = jnp.asarray(np.arange(N_PAD)[None, :] < N_VALID).repeat(B, 0)
    labelB = jnp.ones((B, 1), jnp.float32)

    model_p = build_milnet(cfg.model, segments=B)
    rngs = {"sparse": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    # -- forward only, chained through the feats input to defeat CSE
    @jax.jit
    def fwd1(group, feats):
        loss, _ = tr._bag_loss_fn(group, feats, mask1, label1, rngs, False)
        return loss

    @jax.jit
    def fwdB(group, feats):
        ins, bag, _ = model_p.apply(
            {"params": group["model"]}, feats.reshape(B * N_PAD, D),
            maskB.reshape(B * N_PAD), False, rngs=rngs,
        )
        losses, _ = packed_mixed_mil_loss(
            ins, bag, labelB, maskB.reshape(B * N_PAD), group["w"], None,
            segments=B,
        )
        return losses.mean()

    @jax.jit
    def gradB(group, feats):
        def lf(gr):
            return fwdB.__wrapped__(gr, feats)
        val, g = jax.value_and_grad(lf)(group)
        return val + sum(
            jnp.sum(t.astype(jnp.float32)) * 0.0
            for t in jax.tree_util.tree_leaves(g)
        )

    @jax.jit
    def grad1(group, feats):
        def lf(gr):
            loss, _ = tr._bag_loss_fn(gr, feats, mask1, label1, rngs, False)
            return loss
        val, g = jax.value_and_grad(lf)(group)
        return val + sum(
            jnp.sum(t.astype(jnp.float32)) * 0.0
            for t in jax.tree_util.tree_leaves(g)
        )

    for name, fn, feats, units in (
        ("serial fwd  (1 bag)", fwd1, feats1, 1),
        (f"packed fwd  ({B} bags)", fwdB, featsB, B),
        ("serial fwd+bwd", grad1, feats1, 1),
        (f"packed fwd+bwd ({B} bags)", gradB, featsB, B),
    ):
        box = [feats]
        last = [None]

        def enqueue():
            out = fn(group, box[0])
            # chain: perturb the input with the output so iterations serialize
            box[0] = box[0] + (out * 0.0).astype(box[0].dtype)
            last[0] = out

        def fence():
            float(np.asarray(last[0]))

        med, lo, hi = measure(enqueue, fence, units)
        print(f"{name:28s}: {med:7.1f} bags/s ({lo:.1f}-{hi:.1f})  "
              f"= {1e3 * units / med:6.3f} ms/bag", flush=True)


if __name__ == "__main__":
    main()
