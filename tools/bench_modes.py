"""Secondary throughput benchmarks (not the driver headline): serial vs
batched-bags training mode and bag-inference throughput at Camelyon16
scale.

Dispatches are PIPELINED (no host sync inside the timing loop): a
per-step `np.asarray(loss)` costs a full ~25 ms relay RTT, which is what
made round-2 report batched mode at 131 bags/s ("2.4× slower") — the
device-bound numbers are ~212 batched vs ~303 serial (1.43×, the
vmap-vs-scan backward-fusion gap; tools/profile_batched_step.py)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from snuffy_tpu.configs import (
        MILTrainConfig, OptimizerConfig, SnuffyModelConfig,
    )
    from snuffy_tpu.train.trainer import SnuffyTrainer

    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=384, num_heads=4, big_lambda=512,
            random_patch_share=0.5, activation="gelu", depth=2,
            compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2),
        soft_average=True,
    )
    trainer = SnuffyTrainer(cfg)
    n_pad, n_valid, B = 10240, 10000, 8
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, n_pad, 384)), jnp.float32)
    masks = jnp.asarray(np.arange(n_pad)[None] < n_valid).repeat(B, axis=0)
    labels = jnp.asarray(rng.integers(0, 2, (B, 1)), jnp.float32)
    bag_w = jnp.ones((B,), jnp.float32)
    lr = jnp.asarray(2e-2, jnp.float32)
    state = trainer.init_state(0, example_n=n_pad)

    # serial-scan training (reference semantics: one optimizer step per bag)
    sf = trainer.train_bucket_fn(n_pad)
    state_s = trainer.init_state(1, example_n=n_pad)
    state_s, l, *_ = sf(state_s, feats, masks, labels, lr,
                        jax.random.PRNGKey(0))
    float(np.asarray(l).sum())
    iters = 10
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        state_s, last, *_ = sf(state_s, feats, masks, labels, lr,
                               jax.random.PRNGKey(i))
    float(np.asarray(last).sum())
    dt = time.perf_counter() - t0
    serial_bps = B * iters / dt
    print(f"serial-train: {serial_bps:.1f} bags/s "
          f"({dt / iters * 1e3:.1f} ms per {B}-bag scan)", flush=True)

    # batched-bags training (one optimizer step per B bags)
    bf = trainer.train_bucket_batched_fn(n_pad, B)
    state, l, *_ = bf(state, feats, masks, labels, bag_w, lr,
                      jax.random.PRNGKey(0))
    float(np.asarray(l).sum())
    t0 = time.perf_counter()
    for i in range(iters):
        state, last, *_ = bf(state, feats, masks, labels, bag_w, lr,
                             jax.random.PRNGKey(i))
    float(np.asarray(last).sum())
    dt = time.perf_counter() - t0
    batched_bps = B * iters / dt
    print(f"batched-train: {batched_bps:.1f} bags/s "
          f"({dt / iters * 1e3:.1f} ms per {B}-bag step; "
          f"{batched_bps / serial_bps:.2f}x serial per-bag)", flush=True)

    # inference (packed eval) — B=32 bags per dispatch (serving shape:
    # a bucket's full test set in one call; B=8 is dispatch-RTT-bound)
    Bi = 32
    feats_i = jnp.concatenate([feats] * (Bi // B))
    masks_i = jnp.concatenate([masks] * (Bi // B))
    labels_i = jnp.concatenate([labels] * (Bi // B))
    ef = trainer.eval_bucket_fn(n_pad, Bi)
    group = {"model": state.params, "w": state.w}
    l, s, ins = ef(group, feats_i, masks_i, labels_i, jax.random.PRNGKey(0))
    float(np.asarray(l).sum())
    t0 = time.perf_counter()
    for i in range(iters):
        l, s, ins = ef(group, feats_i, masks_i, labels_i,
                       jax.random.PRNGKey(i))
        float(np.asarray(l).sum())
    dt = time.perf_counter() - t0
    print(f"inference: {Bi * iters / dt:.1f} bags/s "
          f"({dt / iters / Bi * 1e3:.2f} ms per 10k-patch bag)", flush=True)


if __name__ == "__main__":
    main()

# Note: one relay dispatch costs ~25 ms RTT on this rig; per-bag numbers
# above amortize it over the B bags of one call (see
# tools/profile_vmap_vs_scan.py: vmap and scan are within 10% per bag).
