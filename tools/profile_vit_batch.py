"""ViT-S/16 forward throughput vs batch size on the real chip (the e2e
slide-latency driver: 10k patches / batch throughput)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.models.vit import vit_small

ITERS = 20


def main():
    model = vit_small(patch_size=16, output="cls", compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 224, 224, 3), jnp.float32), True)[
        "params"]

    for b in (512,):
        x = jnp.asarray(rng.random((b, 224, 224, 3)).astype(np.float32))

        @jax.jit
        def run(p, x):
            def body(c, _):
                o = model.apply({"params": p}, x + c, True)
                return c + jnp.float32(1e-12), jnp.sum(o)
            _, outs = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return outs

        outs = run(params, x)
        float(np.asarray(outs).sum())
        t0 = time.perf_counter()
        outs = run(params, x)
        float(np.asarray(outs).sum())
        dt = (time.perf_counter() - t0) / ITERS
        print(f"b={b:5d}  {dt*1e3:7.2f} ms/batch  {b/dt:8.0f} img/s  "
              f"10k-slide embed: {10000/(b/dt):.3f} s", flush=True)


if __name__ == "__main__":
    main()
