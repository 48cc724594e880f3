"""Prototype: measured fused end-to-end slide inference (VERDICT r2 item 2).

Builds a synthetic tiled-JPEG pyramidal TIF, runs
pipeline/slide_inference.predict_slide once with host read+decode included,
prints the per-stage breakdown. Used to size the bench.py fused stage.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIDE_TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
WORKERS = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def main():
    import jax

    from snuffy_tpu import native
    from snuffy_tpu.configs import SnuffyModelConfig
    from snuffy_tpu.embed.registry import build_embedder
    from snuffy_tpu.models.snuffy import build_milnet, init_milnet_params
    from snuffy_tpu.pipeline.slide_inference import predict_slide
    from snuffy_tpu.tiling.deepzoom import TilerConfig

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    base_tile = rng.integers(0, 256, (256, 256, 3), np.uint8)
    level0 = np.tile(base_tile, (SIDE_TILES, SIDE_TILES, 1))
    path = "/tmp/proto_slide.tif"
    native.write_tiled_tiff(path, [level0], tile=256, jpeg_quality=75)
    print(f"gen+write {SIDE_TILES}x{SIDE_TILES} tiles:",
          round(time.perf_counter() - t0, 2), "s")

    emb = build_embedder("DINO", "vit_small", patch_size=16,
                         compute_dtype="bfloat16")
    embed_fn = emb.jit_apply()

    cfg = SnuffyModelConfig(
        feats_size=384, num_classes=1, num_heads=4, big_lambda=512,
        random_patch_share=0.5, activation="gelu", depth=2,
        compute_dtype="bfloat16", pallas_tile_n=2048,
    )
    model = build_milnet(cfg)
    params = init_milnet_params(cfg, seed=0, n_example=10240)

    def milnet_apply(p, feats, mask):
        import jax.numpy as jnp

        ins, bag, _ = model.apply(
            {"params": p}, feats, mask, True,
            rngs={"sparse": jax.random.PRNGKey(0)},
        )
        return jax.nn.sigmoid(ins[:, 0]), jax.nn.sigmoid(bag[0])

    tiler_cfg = TilerConfig(objective_power=20.0, base_mag=20.0,
                            tile_size=256, background_threshold=5.0)
    # Warm the two jitted programs (compile is not slide latency in
    # steady-state serving); the classifier warms on the 10240 bucket.
    import jax.numpy as jnp

    t0 = time.perf_counter()
    milnet_jit = jax.jit(milnet_apply)
    embed_fn(emb.params, emb.head_params,
             jnp.zeros((256, 224, 224, 3), jnp.uint8))
    out = milnet_jit(params, jnp.zeros((10240, 384), jnp.float32),
                     jnp.ones((10240,), bool))
    jax.block_until_ready(out)
    print("warmup:", round(time.perf_counter() - t0, 2), "s")

    for run in ("cold", "warm"):
        pred = predict_slide(
            path, embed_fn, emb.params, emb.head_params,
            milnet_jit, params,
            tiler_cfg=tiler_cfg, embed_batch=256, embed_size=224,
            workers=WORKERS,
        )
        print(f"{run} timings:",
              {k: round(v, 3) if isinstance(v, float) else v
               for k, v in pred.timings.items()})
    print("bag score:", pred.bag_score)


if __name__ == "__main__":
    main()
