from vqa_project_tpu.viz.plots import (
    colorline,
    find_question,
    load_image,
    make_segments,
    node_weights_from_adjacency,
    plot_adjacency_graph,
    plot_given_question,
    read_adj,
    resolve_image_path,
    save_predictions_csv,
    visualize_checkpoint,
)

__all__ = [
    "colorline",
    "find_question",
    "load_image",
    "make_segments",
    "node_weights_from_adjacency",
    "plot_adjacency_graph",
    "plot_given_question",
    "read_adj",
    "resolve_image_path",
    "save_predictions_csv",
    "visualize_checkpoint",
]
