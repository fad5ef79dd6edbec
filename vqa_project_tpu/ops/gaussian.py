"""MoNet Gaussian kernel weights over polar pseudo-coordinates.

Parity target: NeighbourhoodGraphConvolution.get_gaussian_weights
(/root/reference/layers.py:100-125). Notable reference semantics we keep:

- precisions are squared and regularized with 1e-14 (layers.py:111,117);
- theta distance wraps: min(|d|, |2*pi - |d||) (layers.py:114-116);
- NaN weights are zeroed BEFORE normalization (layers.py:120);
- normalization is across the KERNEL axis, per edge (layers.py:123 —
  ``dim=1`` of the flattened (B*K*m, n_kernels) view), not across
  neighbours as in standard MoNet.

Divergence (documented): the reference divides by the raw kernel-sum and
yields NaN when every kernel weight underflows to 0; we clamp the
denominator to 1e-20 so such edges contribute 0 instead of NaN.

All math is float32: the 1e-14 epsilons and exp() tails are meaningless
in bf16.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gaussian_kernel_weights(
    pseudo_coord: jnp.ndarray,
    mean_rho: jnp.ndarray,
    mean_theta: jnp.ndarray,
    precision_rho: jnp.ndarray,
    precision_theta: jnp.ndarray,
) -> jnp.ndarray:
    """Per-edge, per-kernel Gaussian weights.

    Args:
      pseudo_coord: (..., 2) polar (rho, theta) pseudo-coordinates.
      mean_rho, mean_theta, precision_rho, precision_theta: (n_kernels,)
        learned Gaussian parameters.
    Returns:
      (..., n_kernels) float32 weights, normalized to sum to 1 across the
      kernel axis for every edge.
    """
    pc = pseudo_coord.astype(jnp.float32)
    rho = pc[..., 0:1]                                   # (..., 1)
    theta = pc[..., 1:2]

    mu_r = mean_rho.astype(jnp.float32).reshape(-1)      # (n,)
    mu_t = mean_theta.astype(jnp.float32).reshape(-1)
    pr = precision_rho.astype(jnp.float32).reshape(-1)
    pt = precision_theta.astype(jnp.float32).reshape(-1)

    w_rho = jnp.exp(-0.5 * (rho - mu_r) ** 2 / (1e-14 + pr**2))

    first = jnp.abs(theta - mu_t)
    second = jnp.abs(2.0 * math.pi - first)
    w_theta = jnp.exp(-0.5 * jnp.minimum(first, second) ** 2 / (1e-14 + pt**2))

    w = w_rho * w_theta
    w = jnp.where(jnp.isnan(w), 0.0, w)
    denom = jnp.sum(w, axis=-1, keepdims=True)
    return w / jnp.maximum(denom, 1e-20)
