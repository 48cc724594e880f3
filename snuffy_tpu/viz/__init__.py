from snuffy_tpu.viz.heatmap import (
    scores_to_grid,
    blend_heatmap,
    visualize_attentions,
)
