"""MoNet-style graph convolution as two batched MXU matmuls.

Parity target: NeighbourhoodGraphConvolution.forward/.convolution
(/root/reference/layers.py:72-144). The reference does
bmm(gaussian_weights^T, gathered_neighbours) followed by n_kernels small
per-kernel Linear layers. Here the gather has already been folded into
dense per-node weights (see neighbourhood.py), so the patch operator is
one einsum over all K nodes, and the n_kernels Linears are one stacked
(n_kernels, in, out/n_kernels) contraction — large, batched, MXU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_precision(compute_dtype) -> jax.lax.Precision:
    """fp32 compute requests exact fp32 matmuls even on TPU.

    TPU fp32 dots default to bf16-pass decomposition; parity/oracle paths
    ask for fp32 and must get true fp32 (Precision.HIGHEST). bf16 compute
    uses the default (fastest) MXU path.
    """
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def graph_convolution(
    features: jnp.ndarray,
    dense_weights: jnp.ndarray,
    conv_kernels: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Aggregate neighbours per Gaussian kernel, then project.

    Args:
      features:      (B, K, in_dim) node features.
      dense_weights: (B, K, n_kernels, K) dense aggregation weights from
                     dense_neighbourhood_weights().
      conv_kernels:  (in_dim, out_dim) fused projection weights; column
                     block n*d:(n+1)*d is kernel n (reference: n_kernels
                     bias-free nn.Linear layers, layers.py:54-55).
    Returns:
      (B, K, out_dim) convolved features, float32.
    """
    b, k, n_kernels, _ = dense_weights.shape
    prec = matmul_precision(compute_dtype)
    f = features.astype(compute_dtype)
    w = dense_weights.astype(compute_dtype)
    # Patch operator: weighted sum over all K nodes per kernel.
    agg = jnp.einsum("binj,bjf->binf", w, f,
                     preferred_element_type=jnp.float32,
                     precision=prec)                      # (B,K,n,in)
    # Stacked per-kernel projections; concat over kernels == reshape.
    kern3 = (conv_kernels.reshape(conv_kernels.shape[0], n_kernels, -1)
             .transpose(1, 0, 2))                         # (n,in,d) view
    out = jnp.einsum("binf,nfd->bind", agg.astype(compute_dtype),
                     kern3.astype(compute_dtype),
                     preferred_element_type=jnp.float32,
                     precision=prec)                      # (B,K,n,out/n)
    return out.reshape(b, k, -1)


def masked_graph_convolution(
    features: jnp.ndarray,
    edge_weights: jnp.ndarray,
    conv_kernels: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
    proj: jnp.ndarray = None,
) -> jnp.ndarray:
    """Project-then-aggregate graph convolution over dense edge weights.

    Algebraically identical to graph_convolution (the two matmuls
    commute: W (X P) == (W X) P), but projecting each node's features
    through the per-kernel matrices FIRST shrinks the intermediate from
    (B, K, n, in_dim) to (B, K, n, out/n) — ~8x less HBM traffic for the
    2052-d conv-1 input — and the aggregation becomes a tiny K x K
    batched matmul.

    Args:
      features:     (B, K, in_dim) node features.
      edge_weights: (B, K, K, n_kernels) dense combined weights
                    (gaussian x alpha/mask; zero outside the top-m
                    neighbourhood).
      conv_kernels: (in_dim, out_dim) fused; column block n*d:(n+1)*d
                    is kernel n.
    Returns:
      (B, K, out_dim) in compute_dtype (bf16 under the default policy —
      unlike graph_convolution, which returns float32; the big
      intermediates are deliberately stored narrow, see below).
    """
    b, k = features.shape[:2]
    n_kernels = edge_weights.shape[-1]
    prec = matmul_precision(compute_dtype)
    # Store the big (B, K, n, d) intermediates in the COMPUTE dtype: the
    # step is HBM-bandwidth-bound (XLA cost analysis: 7.4 GB/step at
    # batch 256 vs 4 ms of FLOPs), and fp32 round-trips double the
    # traffic. The MXU still accumulates fp32 internally for bf16
    # inputs; only the stored rounding changes. `proj=` accepts a
    # precomputed (B, K, n, d) projection (the int8 serving path,
    # ops/quant.py) and skips the dot here.
    if proj is None:
        proj = jnp.dot(
            features.astype(compute_dtype).reshape(b * k, -1),
            conv_kernels.astype(compute_dtype),
            preferred_element_type=compute_dtype,
            precision=prec).reshape(b, k, n_kernels, -1)  # (B,K,n,d)
    out = jnp.einsum("bijn,bjnd->bind",
                     edge_weights.astype(compute_dtype),
                     proj,
                     preferred_element_type=compute_dtype,
                     precision=prec)                      # (B,K,n,d)
    return out.reshape(b, k, -1)
