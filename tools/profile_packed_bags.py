"""A/B the three batched-bags implementations on the real chip at the bench
operating point (N=10240 pad / 10000 valid, d=384, Λ=512, depth=2, bf16,
adamw, soft_average):

  serial — one optimizer step per bag, lax.scan (the reference semantics;
           bench.py's headline, ~335 bags/s r5);
  vmap   — ONE step per batch, per-bag graph vmapped (r3 mode; 0.69× serial
           per-bag — the closed backward-schedule thread, ROUND3.md);
  packed — ONE step per batch, bags folded along the row axis so GEMMs run
           at M=B·N (tools/probe_packed_m_gemm.py measured ~2× per-FLOP
           throughput at pack2 for every MIL shape).

Timing: ≥2 s calibrated windows, 3 repeats, median + spread, host-transfer
fenced (relay caveats, CLAUDE.md). Run: python tools/profile_packed_bags.py
[batch sizes...]

Eval mode — `python tools/profile_packed_bags.py eval [--with-vmap]
[chunk sizes...]` — times the packed deterministic eval forward
(trainer.eval_bucket_fn) at the given chunk sizes. --with-vmap also times
the pre-r5 whole-bucket vmapped eval at B=2 for the A/B; WARNING: its
compile time explodes with B (B=2 ~138 s, B=4 never finished — the
pathology that motivated the packed chunked eval path).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from snuffy_tpu.configs import MILTrainConfig, OptimizerConfig, SnuffyModelConfig

N_PAD, N_VALID = 10240, 10000
WINDOW_S = 2.0


def make_trainer(batch, impl):
    cfg = MILTrainConfig(
        model=SnuffyModelConfig(
            feats_size=384, num_heads=4, big_lambda=512,
            random_patch_share=0.5, activation="gelu", depth=2,
            compute_dtype="bfloat16",
        ),
        optim=OptimizerConfig(optimizer="adamw", lr=2e-2),
        soft_average=True,
        bag_batch_size=batch,
        bag_batch_impl=impl,
        use_mesh=0,
    )
    from snuffy_tpu.train.trainer import SnuffyTrainer

    return SnuffyTrainer(cfg)


def measure(step_once, fence, bags_per_call):
    """probe → calibrate window → 3 windows → (median, min, max) bags/s.

    step_once() only ENQUEUES (donated state chains the steps); fence()
    does ONE real host transfer — per-step fetches would time the relay's
    ~25 ms RTT instead of the step (CLAUDE.md)."""
    step_once()
    fence()  # compile
    t0 = time.perf_counter()
    for _ in range(4):
        step_once()
    fence()
    probe = (time.perf_counter() - t0) / 4
    iters = max(4, int(np.ceil(WINDOW_S / probe)))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            step_once()
        fence()
        dt = time.perf_counter() - t0
        rates.append(bags_per_call * iters / dt)
    rates.sort()
    return rates[1], rates[0], rates[2]


def main_eval(args):
    """Packed eval-forward throughput per chunk size (+ optional legacy
    whole-bucket vmap A/B)."""
    with_vmap = "--with-vmap" in args
    chunks = [int(a) for a in args if not a.startswith("--")] or [1, 2, 4, 8]
    rng = np.random.default_rng(0)
    tr = make_trainer(1, "vmap")
    state = tr.init_state(0, example_n=N_PAD)
    group = {"model": state.params, "w": state.w}

    def bucket(b):
        feats = jnp.asarray(
            rng.standard_normal((b, N_PAD, 384)), jnp.float32)
        masks = jnp.asarray(np.arange(N_PAD)[None, :] < N_VALID).repeat(b, 0)
        labels = jnp.asarray(rng.integers(0, 2, (b, 1)), jnp.float32)
        return feats, masks, labels

    for b in chunks:
        feats, masks, labels = bucket(b)
        fn = tr.eval_bucket_fn(N_PAD, b)
        out = [None]

        def once():
            out[0] = fn(group, feats, masks, labels, jax.random.PRNGKey(1))

        def fence():
            np.asarray(out[0][0]).sum()

        med, lo, hi = measure(once, fence, b)
        print(f"packed eval chunk={b:2d}: {med:7.1f} bags/s  "
              f"({lo:.1f}-{hi:.1f})", flush=True)

    if with_vmap:
        b = 2
        feats, masks, labels = bucket(b)

        def eval_vmapped(group, feats_b, masks_b, labels_b, rng_key):
            # the pre-r5 whole-bucket eval: per-bag graph vmapped
            def one(f, m, lbl, key):
                from snuffy_tpu.train.losses import mixed_mil_loss

                ins, bag, _ = tr.model.apply(
                    {"params": group["model"]}, f, m, True,
                    rngs={"sparse": key},
                )
                loss, score = mixed_mil_loss(ins, bag, lbl, m, group["w"],
                                             None)
                return loss, score, jax.nn.sigmoid(ins)

            keys = jax.random.split(rng_key, feats_b.shape[0])
            return jax.vmap(one)(feats_b, masks_b, labels_b, keys)

        fn = jax.jit(eval_vmapped)
        out = [None]

        def once_v():
            out[0] = fn(group, feats, masks, labels, jax.random.PRNGKey(1))

        def fence_v():
            np.asarray(out[0][0]).sum()

        t0 = time.perf_counter()
        once_v()
        fence_v()
        print(f"vmap eval B={b} compile+first: {time.perf_counter() - t0:.1f} s",
              flush=True)
        med, lo, hi = measure(once_v, fence_v, b)
        print(f"vmap   eval B={b:2d}    : {med:7.1f} bags/s  "
              f"({lo:.1f}-{hi:.1f})", flush=True)


def main():
    if sys.argv[1:2] == ["eval"]:
        main_eval(sys.argv[2:])
        return
    batches = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    rng = np.random.default_rng(0)

    # serial baseline (scan over 8 bags, one update per bag)
    tr = make_trainer(1, "vmap")
    bags = 8
    feats = jnp.asarray(
        rng.standard_normal((bags, N_PAD, 384)), jnp.float32)
    masks = jnp.asarray(np.arange(N_PAD)[None, :] < N_VALID).repeat(bags, 0)
    labels = jnp.asarray(rng.integers(0, 2, (bags, 1)), jnp.float32)
    state = [tr.init_state(0, example_n=N_PAD)]
    fn = tr.train_bucket_fn(N_PAD)
    lr = jnp.asarray(2e-2, jnp.float32)

    last = [None]

    def serial_once():
        st, losses, *_ = fn(state[0], feats, masks, labels, lr,
                            jax.random.PRNGKey(1))
        state[0] = st
        last[0] = losses

    def fence():
        np.asarray(last[0]).sum()

    med, lo, hi = measure(serial_once, fence, bags)
    print(f"serial scan          : {med:7.1f} bags/s  ({lo:.1f}-{hi:.1f})",
          flush=True)

    for batch in batches:
        feats_b = jnp.asarray(
            rng.standard_normal((batch, N_PAD, 384)), jnp.float32)
        masks_b = jnp.asarray(
            np.arange(N_PAD)[None, :] < N_VALID).repeat(batch, 0)
        labels_b = jnp.asarray(rng.integers(0, 2, (batch, 1)), jnp.float32)
        bag_w = jnp.ones((batch,), jnp.float32)
        for impl in ("vmap", "packed"):
            tr = make_trainer(batch, impl)
            st = [tr.init_state(0, example_n=N_PAD)]
            step = tr.train_bucket_batched_fn(N_PAD, batch)

            lastb = [None]

            def batched_once():
                s2, losses, *_ = step(st[0], feats_b, masks_b, labels_b,
                                      bag_w, lr, jax.random.PRNGKey(1))
                st[0] = s2
                lastb[0] = losses

            def fence_b():
                np.asarray(lastb[0]).sum()

            med, lo, hi = measure(batched_once, fence_b, batch)
            print(f"{impl:6s} batch={batch:2d}     : {med:7.1f} bags/s  "
                  f"({lo:.1f}-{hi:.1f})", flush=True)


if __name__ == "__main__":
    main()
