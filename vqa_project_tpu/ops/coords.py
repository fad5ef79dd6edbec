"""Bounding-box geometry: centres and pairwise polar pseudo-coordinates.

Parity target: Model._compute_pseudo and the bbox-centre computation in
Model.forward (/root/reference/sparse_graph_model.py:105-108,244-269).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_centres(image_features: jnp.ndarray) -> jnp.ndarray:
    """Extract normalized bbox centres from the last 4 feature channels.

    The ingest path appends the xyxy bbox (normalized by image size) to the
    visual features, so ``image_features[..., -4:]`` is ``(x1, y1, x2, y2)``.

    Args:
      image_features: (B, K, feat_dim) with bbox in the trailing 4 dims.
    Returns:
      (B, K, 2) box centres ``(cx, cy)``.
    """
    bb = image_features[..., -4:]
    size = bb[..., 2:] - bb[..., :2]          # (dx, dy)
    return bb[..., :2] + 0.5 * size


def polar_pseudo_coords(bb_centre: jnp.ndarray) -> jnp.ndarray:
    """Pairwise polar pseudo-coordinates u(i, j) between box centres.

    rho is the Euclidean distance between centres i and j; theta is
    ``atan2(dx, dy)`` — note the (x, y) argument order matches the
    reference exactly (sparse_graph_model.py:264-265), which measures the
    angle from the +y axis.

    Computed in float32 regardless of the compute dtype: downstream
    Gaussian weights divide by 1e-14-regularized precisions and collapse
    in bf16.

    Args:
      bb_centre: (B, K, 2) box centres.
    Returns:
      (B, K, K, 2) stacked (rho, theta).
    """
    c = bb_centre.astype(jnp.float32)
    diff = c[:, :, None, :] - c[:, None, :, :]           # (B, K, K, 2)
    rho = jnp.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)
    theta = jnp.arctan2(diff[..., 0], diff[..., 1])
    return jnp.stack([rho, theta], axis=-1)
