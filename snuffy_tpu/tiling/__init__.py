from snuffy_tpu.tiling.deepzoom import (
    TilerConfig,
    edge_energy,
    tile_slide,
    rasterize_annotations,
)
