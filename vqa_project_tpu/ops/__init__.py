"""Pure-functional compute ops for the conditioned-graph VQA model.

Every op is a jit-safe pure function over fixed-shape arrays. Each has a
unit test against a numpy/torch oracle in tests/test_ops.py.
"""

from vqa_project_tpu.ops.coords import bbox_centres, polar_pseudo_coords
from vqa_project_tpu.ops.gaussian import gaussian_kernel_weights
from vqa_project_tpu.ops.neighbourhood import (
    topk_edge_softmax,
    scatter_to_dense,
    dense_neighbourhood_weights,
)
from vqa_project_tpu.ops.graph_conv import graph_convolution
from vqa_project_tpu.ops.gru import gru_encode
from vqa_project_tpu.ops.losses import (
    multilabel_soft_margin_loss,
    vqa_score,
)

__all__ = [
    "bbox_centres",
    "polar_pseudo_coords",
    "gaussian_kernel_weights",
    "topk_edge_softmax",
    "scatter_to_dense",
    "dense_neighbourhood_weights",
    "graph_convolution",
    "gru_encode",
    "multilabel_soft_margin_loss",
    "vqa_score",
]
