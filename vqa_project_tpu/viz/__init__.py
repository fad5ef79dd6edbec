from vqa_project_tpu.viz.plots import (
    colorline,
    make_segments,
    node_weights_from_adjacency,
    plot_adjacency_graph,
    read_adj,
    save_predictions_csv,
    visualize_checkpoint,
)

__all__ = [
    "colorline",
    "make_segments",
    "node_weights_from_adjacency",
    "plot_adjacency_graph",
    "read_adj",
    "save_predictions_csv",
    "visualize_checkpoint",
]
