"""Probe: do the MIL GEMM shapes get meaningfully faster at larger M?

ROOFLINE.md §3 pins the serial MIL step at ~88% of its mixed-shape bound
and says beating it needs *different arithmetic*. One untried arithmetic:
pack k bags along the row (N) axis into one program — the GEMMs then run
at M = k*10240 in the SAME (unbatched) graph, sidestepping the closed
vmap-backward-schedule thread (ROUND3.md) entirely. Whether that can win
depends on how much the per-shape MXU ceilings rise with M.

Measures, amortized over a 16-deep data-dependent chain (relay floor
caveat, CLAUDE.md): the three forward MIL shapes and the fat-K
weight-grad shapes at M (=K for wgrad) in {10240, 20480, 40960}.

Run on the real chip: python tools/probe_packed_m_gemm.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

PEAK_BF16 = 197e12
REPS = 16
ITERS = 12


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def probe(m, k, n, tag):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        acc = jnp.zeros((), jnp.float32)
        x = a
        for _ in range(REPS):
            y = x @ b
            acc += y[0, 0].astype(jnp.float32)
            x = a + y[:, :1].astype(a.dtype)
        return acc

    dt = timeit(mm, a, b) / REPS
    fl = 2 * m * k * n
    print(f"{tag:44s} {dt * 1e3:8.3f} ms  {fl / dt / 1e12:6.1f} TFLOP/s "
          f"({fl / dt / PEAK_BF16 * 100:4.1f}% peak)", flush=True)
    return fl / dt


def main():
    print("--- forward MIL shapes vs packed M (bf16, amortized x16) ---",
          flush=True)
    for mult in (1, 2, 4):
        m = 10240 * mult
        probe(m, 384, 1536, f"ffn-in   {m}x384x1536 (pack{mult})")
        probe(m, 1536, 384, f"ffn-out  {m}x1536x384 (pack{mult})")
        probe(m, 384, 384, f"qkv/o    {m}x384x384  (pack{mult})")
    print("--- attention score GEMM N x Lambda (skinny) ---", flush=True)
    for mult in (1, 2, 4):
        m = 10240 * mult
        # scores: (N, dk=96 per head x4 heads folded) vs Lambda=512 keys
        probe(m, 96, 512, f"scores/head {m}x96x512 (pack{mult})")
    print("--- weight-grad fat-K shapes (K = packed N) ---", flush=True)
    for mult in (1, 2, 4):
        kk = 10240 * mult
        probe(384, kk, 1536, f"wgrad ffn-in  384x{kk}x1536 (pack{mult})")
        probe(384, kk, 384, f"wgrad qkv/o   384x{kk}x384  (pack{mult})")


if __name__ == "__main__":
    main()
