"""The dense-masked neighbourhood formulation equals the sparse
topk+gather+scatter path (which itself is oracle-tested in test_ops)."""

import jax.numpy as jnp
import numpy as np

from vqa_project_tpu.ops import (
    dense_neighbourhood_weights,
    gaussian_kernel_weights,
    graph_convolution,
    topk_edge_softmax,
)
from vqa_project_tpu.ops.graph_conv import masked_graph_convolution
from vqa_project_tpu.ops.neighbourhood import masked_neighbourhood

B, K, M, N_KERN, F = 3, 12, 5, 4, 24


def _inputs(rng):
    adj = rng.normal(size=(B, K, K)).astype(np.float32)
    pseudo = np.stack(
        [rng.uniform(0, 1.5, size=(B, K, K)),
         rng.uniform(-np.pi, np.pi, size=(B, K, K))], axis=-1
    ).astype(np.float32)
    feats = rng.normal(size=(B, K, F)).astype(np.float32)
    gparams = [rng.uniform(0.1, 1.0, N_KERN).astype(np.float32)
               for _ in range(4)]
    out_dim = 16
    kernels = (rng.normal(size=(N_KERN, F, out_dim // N_KERN))
               .astype(np.float32) * 0.1)
    return adj, pseudo, feats, gparams, kernels


def test_masked_alpha_equals_sparse_softmax(rng):
    adj, *_ = _inputs(rng)
    alpha_d, mask = masked_neighbourhood(jnp.asarray(adj), M)
    alpha_s, idx = topk_edge_softmax(jnp.asarray(adj), M)
    alpha_d, mask = np.asarray(alpha_d), np.asarray(mask)
    alpha_s, idx = np.asarray(alpha_s), np.asarray(idx)
    assert mask.sum(-1).max() == M and mask.sum(-1).min() == M
    dense_from_sparse = np.zeros((B, K, K), np.float32)
    for b in range(B):
        for i in range(K):
            dense_from_sparse[b, i, idx[b, i]] = alpha_s[b, i]
    np.testing.assert_allclose(alpha_d, dense_from_sparse,
                               rtol=1e-5, atol=1e-7)


def test_masked_conv_equals_sparse_conv(rng):
    adj, pseudo, feats, gparams, kernels = _inputs(rng)
    adj_j, pseudo_j = jnp.asarray(adj), jnp.asarray(pseudo)
    gj = [jnp.asarray(g) for g in gparams]

    # dense-masked path (what the model runs)
    alpha, mask = masked_neighbourhood(adj_j, M)
    gw_full = gaussian_kernel_weights(pseudo_j, *gj)     # (B,K,K,n)
    for selection in (alpha, mask):
        got = np.asarray(masked_graph_convolution(
            jnp.asarray(feats), gw_full * selection[..., None],
            jnp.asarray(kernels), compute_dtype=jnp.float32))

        # sparse reference path
        alpha_s, idx = topk_edge_softmax(adj_j, M)
        npseudo = jnp.take_along_axis(pseudo_j, idx[..., None], axis=2)
        gw = gaussian_kernel_weights(npseudo, *gj)       # (B,K,m,n)
        dense_w = dense_neighbourhood_weights(
            alpha_s, idx, gw, K, weight_by_alpha=selection is alpha)
        expected = np.asarray(graph_convolution(
            jnp.asarray(feats), dense_w, jnp.asarray(kernels),
            compute_dtype=jnp.float32))

        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)
