"""Why is vmapped bag eval slower per bag than the scanned serial train
step? Isolate: same forward, vmap vs scan vs single; with and without the
Pallas kernel."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from snuffy_tpu.configs import SnuffyModelConfig
from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params

B, n_pad, n_valid, d = 8, 10240, 10000, 384


def bench(fn, args, label, per=1):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).sum(), out)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: float(np.asarray(x).sum()), out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:8.2f} ms/call  {dt/per*1e3:7.2f} ms/bag",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, n_pad, d)), jnp.float32)
    mask = jnp.asarray(np.arange(n_pad)[None] < n_valid).repeat(B, axis=0)

    for use_pallas, tag in ((True, "pallas"),):
        cfg = SnuffyModelConfig(
            feats_size=d, num_heads=4, big_lambda=512,
            random_patch_share=0.5, activation="gelu", depth=2,
            compute_dtype="bfloat16", use_pallas=use_pallas,
        )
        model = build_milnet(cfg)
        params = init_milnet_params(cfg, seed=0, n_example=n_pad)

        def one(f, m, k):
            return model.apply({"params": params}, f, m, True,
                               rngs={"sparse": k})[1]

        keys = jax.random.split(jax.random.PRNGKey(0), B)

        vm = jax.jit(jax.vmap(one))
        bench(vm, (feats, mask, keys), f"{tag} vmap B=8", per=B)

        def scanned(fs, ms, ks):
            def body(c, xs):
                f, m, k = xs
                return c, one(f, m, k)
            _, outs = jax.lax.scan(body, 0.0, (fs, ms, ks))
            return outs

        sc = jax.jit(scanned)
        bench(sc, (feats, mask, keys), f"{tag} scan B=8", per=B)

        single = jax.jit(one)
        bench(single, (feats[0], mask[0], keys[0]), f"{tag} single", per=1)


if __name__ == "__main__":
    main()
