"""Fused Pallas TPU kernel: top-m mask + edge softmax + Gaussian kernel
weights + neighbourhood aggregation in one VMEM-resident pass.

This is the fused "graph block" of the BASELINE.json north star: given
the learned adjacency, the polar pseudo-coordinates and the per-kernel
PROJECTED node features, it produces the convolved features without ever
materializing the (B, K, K, n_kernels) edge-weight tensor in HBM. One
grid step processes one image; everything (rank computation, masked
softmax, Gaussian weights, n_kernels KxK matmuls) happens in VMEM.

Semantics are identical to the XLA path
(ops.neighbourhood.masked_neighbourhood +
ops.graph_conv.masked_graph_convolution with pre-projected features);
edge_aggregate_reference() below IS that path and serves as the
correctness oracle + the custom-vjp backward.

Top-m selection uses the rank formulation: edge (i, j) is selected iff
fewer than m entries of row i are strictly greater — exactly equivalent
to adj >= (m-th largest), including tie behaviour.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_project_tpu.ops.gaussian import gaussian_kernel_weights
from vqa_project_tpu.ops.neighbourhood import masked_neighbourhood


def _kernel(adj_ref, pseudo_ref, proj_ref, gp_ref, out_ref, *,
            m: int, n_kernels: int, d: int, use_alpha: bool):
    k = adj_ref.shape[1]
    adj = adj_ref[0]                                   # (K, K) f32
    rho = pseudo_ref[0, 0]                             # (K, K) f32
    theta = pseudo_ref[0, 1]                           # (K, K)

    # --- top-m mask via pairwise rank with lowest-index tie-breaking:
    # j' beats j iff adj[j'] > adj[j] or (equal and j' < j); selecting
    # rank < m picks EXACTLY m entries per row (matches
    # ops.neighbourhood.masked_neighbourhood incl. all-equal rows) ---
    beats = (adj[:, :, None] > adj[:, None, :])
    jp = jax.lax.broadcasted_iota(jnp.int32, (k, k, k), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, k, k), 2)
    ties = (adj[:, :, None] == adj[:, None, :]) & (jp < jj)
    rank = jnp.sum((beats | ties).astype(jnp.float32), axis=1)  # (K, K)
    mask = (rank < float(m)).astype(jnp.float32)

    # --- masked softmax over the row (exact zeros off-neighbourhood) ---
    neg = jnp.float32(-1e30)
    masked_adj = jnp.where(mask > 0, adj, neg)
    rowmax = jnp.max(masked_adj, axis=-1, keepdims=True)
    ex = jnp.exp(masked_adj - rowmax) * mask
    alpha = ex / jnp.sum(ex, axis=-1, keepdims=True)
    sel = alpha if use_alpha else mask

    # --- Gaussian kernel weights, normalized across kernels per edge ---
    two_pi = jnp.float32(2.0 * math.pi)
    gws = []
    denom = jnp.zeros((k, k), jnp.float32)
    for n in range(n_kernels):
        mu_r = gp_ref[0, n]
        mu_t = gp_ref[1, n]
        pr = gp_ref[2, n]
        pt = gp_ref[3, n]
        w_r = jnp.exp(-0.5 * (rho - mu_r) ** 2 / (1e-14 + pr * pr))
        first = jnp.abs(theta - mu_t)
        second = jnp.abs(two_pi - first)
        dtheta = jnp.minimum(first, second)
        w_t = jnp.exp(-0.5 * dtheta * dtheta / (1e-14 + pt * pt))
        w = w_r * w_t
        w = jnp.where(jnp.isnan(w), 0.0, w)
        gws.append(w)
        denom = denom + w
    denom = jnp.maximum(denom, 1e-20)

    # --- per-kernel aggregation: out_n = (sel * gw_n / denom) @ proj_n ---
    for n in range(n_kernels):
        w_n = sel * (gws[n] / denom)                   # (K, K)
        p_n = proj_ref[0, :, n * d:(n + 1) * d]        # (K, d)
        out_ref[0, :, n * d:(n + 1) * d] = jnp.dot(
            w_n, p_n.astype(jnp.float32),
            preferred_element_type=jnp.float32)


def _pallas_forward(adj, pseudo, proj, gparams, *, m, use_alpha,
                    interpret=False):
    b, k, _ = adj.shape
    n_kernels = gparams.shape[1]
    nd = proj.shape[-1]
    d = nd // n_kernels
    # pseudo arrives (B, K, K, 2); the kernel wants channel-major planes
    pseudo_cm = jnp.moveaxis(pseudo, -1, 1)            # (B, 2, K, K)

    kern = functools.partial(_kernel, m=m, n_kernels=n_kernels, d=d,
                             use_alpha=use_alpha)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, k, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, nd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, k, nd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, nd), jnp.float32),
        interpret=interpret,
    )(adj.astype(jnp.float32), pseudo_cm.astype(jnp.float32),
      proj, gparams.astype(jnp.float32))


def edge_aggregate_reference(adj, pseudo, proj, gparams, *, m, use_alpha):
    """XLA reference implementation (= the model's standard path, with
    features already projected): oracle for the kernel and its backward."""
    n_kernels = gparams.shape[1]
    alpha, mask = masked_neighbourhood(adj, m)
    sel = alpha if use_alpha else mask
    gw = gaussian_kernel_weights(pseudo, gparams[0], gparams[1],
                                 gparams[2], gparams[3])  # (B,K,K,n)
    edge_w = gw * sel[..., None]
    b, k, nd = proj.shape
    d = nd // n_kernels
    proj4 = proj.reshape(b, k, n_kernels, d)
    out = jnp.einsum("bijn,bjnd->bind", edge_w,
                     proj4.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, k, nd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_edge_aggregate(adj, pseudo, proj, gparams, m, use_alpha,
                         interpret=False):
    """Differentiable fused graph block.

    Forward runs the Pallas kernel; backward differentiates the XLA
    reference (identical math), so training with the fused kernel is
    exact. Args:
      adj:     (B, K, K) learned adjacency (fp32).
      pseudo:  (B, K, K, 2) polar pseudo-coordinates.
      proj:    (B, K, n_kernels*d) per-kernel projected node features.
      gparams: (4, n_kernels) stacked [mean_rho; mean_theta;
               precision_rho; precision_theta].
    Returns: (B, K, n_kernels*d) float32.
    """
    return _pallas_forward(adj, pseudo, proj, gparams, m=m,
                           use_alpha=use_alpha, interpret=interpret)


def _fwd(adj, pseudo, proj, gparams, m, use_alpha, interpret):
    out = _pallas_forward(adj, pseudo, proj, gparams, m=m,
                          use_alpha=use_alpha, interpret=interpret)
    return out, (adj, pseudo, proj, gparams)


def _bwd(m, use_alpha, interpret, res, g):
    adj, pseudo, proj, gparams = res
    _, vjp = jax.vjp(
        lambda a, p, pr, gp: edge_aggregate_reference(
            a, p, pr, gp, m=m, use_alpha=use_alpha),
        adj, pseudo, proj, gparams)
    return vjp(g)


fused_edge_aggregate.defvjp(_fwd, _bwd)
