from snuffy_tpu.embed.registry import build_embedder, EMBEDDER_FEAT_DIMS
