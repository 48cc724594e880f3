"""Roofline decomposition for the two headline device numbers
(VERDICT r2 next-8c): ViT-S/16 extraction ≈5.1k img/s (~24% of bf16 peak)
and the MIL train step (useful-work MFU ≈0.36). Measures, on the real
chip:

  1. MXU ceilings at the EXACT GEMM shapes the models run (what fraction
     of the 197 TFLOP/s bf16 peak is reachable at all for each shape);
  2. the attention einsum chain at n=197 (the known-inefficient small-n
     part: K=64 contractions + softmax);
  3. an elementwise LayerNorm/GeLU/residual chain at ViT activation
     shapes (the HBM-bound part — compare against the 819 GB/s v5e HBM
     roofline);
  4. extraction batch sweep 256/512/1024 (VERDICT next-8b) on the SAME
     jitted program bench.py uses, incl. a donated-input variant;
  5. the MIL fwd+bwd split (fwd-only vs fwd+bwd at the bench operating
     point).

All dispatches are pipelined; every timing fences with a scalar host
fetch (relay early-return caveat, CLAUDE.md). Results feed ROOFLINE.md.
Run: python tools/roofline_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12  # v5e
HBM_BPS = 819e9

ITERS = 20


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def report(name, dt, flops=None, bytes_moved=None):
    line = f"{name:52s} {dt * 1e3:9.3f} ms"
    if flops:
        line += f"  {flops / dt / 1e12:6.1f} TFLOP/s ({flops / dt / PEAK_BF16 * 100:4.1f}% peak)"
    if bytes_moved:
        line += f"  {bytes_moved / dt / 1e9:6.0f} GB/s ({bytes_moved / dt / HBM_BPS * 100:4.1f}% HBM)"
    print(line, flush=True)


def gemm_ceilings():
    """MXU ceiling at the model's GEMM shapes (bf16, f32 accum)."""
    print("--- GEMM ceilings (bf16) ---", flush=True)
    # (M, K, N, tag)
    shapes = [
        (256 * 197, 384, 1152, "ViT qkv   (B=256: 50432x384x1152)"),
        (256 * 197, 384, 384, "ViT proj  (50432x384x384)"),
        (256 * 197, 384, 1536, "ViT mlp-in (50432x384x1536)"),
        (256 * 197, 1536, 384, "ViT mlp-out (50432x1536x384)"),
        (10240, 384, 1536, "MIL ffn-in (10240x384x1536)"),
        (10240, 1536, 384, "MIL ffn-out (10240x1536x384)"),
        (10240, 384, 384, "MIL qkv/o  (10240x384x384)"),
        (8192, 8192, 8192, "square 8k (reference ceiling)"),
    ]
    key = jax.random.PRNGKey(0)
    for m, k, n, tag in shapes:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return (a @ b).sum()

        dt = timeit(mm, a, b)
        report(tag, dt, flops=2 * m * k * n)


def gemm_ceilings_amortized(reps=16):
    """Per-shape GEMM ceilings with the relay dispatch floor amortized:
    ONE jitted program chains `reps` data-dependent GEMMs (each reads the
    previous result, so XLA cannot CSE them). The single-dispatch probes
    above are floor-contaminated for small shapes (a 3.2 GFLOP GEMM
    'measures' 1.5 ms — the ~1.5 ms/dispatch relay floor, not the MXU)."""
    print(f"--- GEMM ceilings, amortized x{reps} (bf16) ---", flush=True)
    shapes = [
        (256 * 197, 384, 1152, "ViT qkv   (50432x384x1152)"),
        (256 * 197, 384, 384, "ViT proj  (50432x384x384)"),
        (256 * 197, 384, 1536, "ViT mlp-in (50432x384x1536)"),
        (256 * 197, 1536, 384, "ViT mlp-out (50432x1536x384)"),
        (10240, 384, 1536, "MIL ffn-in (10240x384x1536)"),
        (10240, 1536, 384, "MIL ffn-out (10240x1536x384)"),
        (10240, 384, 384, "MIL qkv/o  (10240x384x384)"),
        (8192, 8192, 8192, "square 8k (reference ceiling)"),
    ]
    key = jax.random.PRNGKey(0)
    for m, k, n, tag in shapes:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            acc = jnp.zeros((), jnp.float32)
            x = a
            for _ in range(reps):
                y = x @ b                       # (m, n)
                acc += y[0, 0].astype(jnp.float32)
                x = a + y[:, :1].astype(a.dtype)   # serialize the chain
            return acc

        iters = 5 if m >= 8192 and k >= 8192 else ITERS
        dt = timeit(mm, a, b, iters=iters) / reps
        report(tag, dt, flops=2 * m * k * n)


def attention_chain():
    """The n=197 attention einsum chain per ViT layer, batched over
    images: scores (z,n,n) + softmax + AV, z = B*heads."""
    print("--- ViT attention chain (B=256, h=6, n=197, dk=64) ---",
          flush=True)
    B, h, n, dk = 256, 6, 197, 64
    z = B * h
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (z, n, dk), jnp.bfloat16)
    k = jax.random.normal(key, (z, n, dk), jnp.bfloat16)
    v = jax.random.normal(key, (z, n, dk), jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        s = jnp.einsum("znd,zmd->znm", q, k) * (dk**-0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("znm,zmd->znd", p, v).sum()

    dt = timeit(chain, q, k, v)
    flops = 2 * z * n * n * dk * 2
    # scores + probs read/write dominate
    bytes_moved = z * n * n * (2 + 4 + 4 + 2) + 3 * z * n * dk * 2
    report("einsum chain (scores+softmax+AV)", dt, flops, bytes_moved)
    print(f"    per ViT-S layer per image: {dt / B * 1e6:.1f} us "
          f"(x12 layers = {dt / B * 12 * 1e3:.3f} ms/img)", flush=True)


def elementwise_chain():
    """LayerNorm+GeLU+residual at ViT activation shapes — HBM roofline."""
    print("--- elementwise/VPU chain (B*n=50432, d=384) ---", flush=True)
    m, d = 256 * 197, 384
    x = jax.random.normal(jax.random.PRNGKey(0), (m, d), jnp.bfloat16)

    @jax.jit
    def chain(x):
        mu = x.astype(jnp.float32).mean(-1, keepdims=True)
        va = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        y = ((x - mu) * jax.lax.rsqrt(va + 1e-6)).astype(jnp.bfloat16)
        y = jax.nn.gelu(y)
        return (x + y).sum()

    dt = timeit(chain, x)
    bytes_moved = m * d * 2 * 2  # one read one write, fused
    report("LN+GeLU+residual (fused est.)", dt, bytes_moved=bytes_moved)


def extraction_sweep():
    """ViT-S/16 extraction throughput vs batch, and donated input."""
    print("--- ViT-S/16 extraction batch sweep ---", flush=True)
    from snuffy_tpu.embed.registry import build_embedder

    emb = build_embedder(
        embedder="DINO", backbone="vit_small", patch_size=16,
        num_classes=2, compute_dtype="bfloat16",
    )
    emb.init_head(0)
    fn = emb.jit_apply()
    for batch in (256, 512, 1024):
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (batch, 224, 224, 3)),
            jnp.uint8,
        )
        dt = timeit(lambda xx: fn(emb.params, emb.head_params, xx)[0], x,
                    iters=10)
        report(f"batch {batch:4d}", dt, flops=batch * 9.2e9)
        print(f"    {batch / dt:8.1f} img/s", flush=True)

    # donated-input variant (VERDICT next-8b asked for it): donation can
    # only help when the input buffer is device-produced and reusable —
    # for host-fed uint8 batches the upload dominates any aliasing win,
    # so measure with a device-side producer feeding a donated embed.
    batch = 512
    don_fn = jax.jit(
        lambda p, hp, im: fn(p, hp, im)[0].sum(), donate_argnums=(2,)
    )
    produce = jax.jit(
        lambda k: jax.random.randint(
            k, (batch, 224, 224, 3), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )

    def produced_step(key):
        return don_fn(emb.params, emb.head_params, produce(key))

    dt = timeit(produced_step, jax.random.PRNGKey(0), iters=10)
    print(f"    device-produced + donated input, batch {batch}: "
          f"{batch / dt:.1f} img/s", flush=True)


def mil_split():
    """MIL step: fwd vs fwd+bwd at the bench operating point."""
    print("--- MIL step split (N=10240, L=1024, d=384, depth=2) ---",
          flush=True)
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
    N = 10240
    state = trainer.init_state(0, example_n=N)
    group = {"model": state.params, "w": state.w}
    feats = jax.jit(
        lambda k: jax.random.normal(k, (N, 384), jnp.float32)
    )(jax.random.PRNGKey(1))
    mask = jnp.asarray(np.arange(N) < 10000)
    label = jnp.ones((1,), jnp.float32)

    @jax.jit
    def fwd(group, feats):
        loss, _ = trainer._bag_loss_fn(
            group, feats, mask, label,
            {"sparse": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, False,
        )
        return loss

    # value_and_grad over the same loss, grads consumed
    @jax.jit
    def fwdbwd(group, feats):
        def loss_fn(gr):
            loss, _ = trainer._bag_loss_fn(
                gr, feats, mask, label,
                {"sparse": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, False,
            )
            return loss

        val, g = jax.value_and_grad(loss_fn)(group)
        gsum = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda t: jnp.sum(t.astype(jnp.float32)), g
            ),
        )
        return val + 0.0 * gsum

    FLOPS_BAG = 225968099328 / 3  # bench.py counts fwd+bwd as 3x fwd
    dt = timeit(fwd, group, feats)
    report("fwd only (1 bag)", dt, flops=FLOPS_BAG)
    dt = timeit(fwdbwd, group, feats)
    report("fwd+bwd (1 bag)", dt, flops=FLOPS_BAG * 3)


def main():
    stages = sys.argv[1:] or ["gemm", "gemm_amortized", "attn", "elem",
                              "extract", "mil"]
    fns = {"gemm": gemm_ceilings, "gemm_amortized": gemm_ceilings_amortized,
           "attn": attention_chain, "elem": elementwise_chain,
           "extract": extraction_sweep, "mil": mil_split}
    for s in stages:
        fns[s]()


if __name__ == "__main__":
    main()
