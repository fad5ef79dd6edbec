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
    # built (n, f, d) for the numpy oracle; the framework takes the
    # fused (f, n*d) layout (column block n = kernel n)
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
        fused = jnp.asarray(kernels.transpose(1, 0, 2)
                            .reshape(kernels.shape[1], -1))
        got = np.asarray(masked_graph_convolution(
            jnp.asarray(feats), gw_full * selection[..., None],
            fused, compute_dtype=jnp.float32))

        # sparse reference path
        alpha_s, idx = topk_edge_softmax(adj_j, M)
        npseudo = jnp.take_along_axis(pseudo_j, idx[..., None], axis=2)
        gw = gaussian_kernel_weights(npseudo, *gj)       # (B,K,m,n)
        dense_w = dense_neighbourhood_weights(
            alpha_s, idx, gw, K, weight_by_alpha=selection is alpha)
        expected = np.asarray(graph_convolution(
            jnp.asarray(feats), dense_w, fused,
            compute_dtype=jnp.float32))

        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_masked_neighbourhood_exactly_m_with_ties(rng):
    """All-equal rows (e.g. ReLU-dead adjacency rows) still select
    exactly m neighbours, lowest indices first."""
    adj = np.zeros((2, K, K), np.float32)
    adj[1] = rng.normal(size=(K, K))
    adj[1, 3] = 0.5  # a fully tied row among distinct rows
    alpha, mask = masked_neighbourhood(jnp.asarray(adj), M)
    mask = np.asarray(mask)
    alpha = np.asarray(alpha)
    assert (mask.sum(-1) == M).all()
    # zero rows: lowest-index neighbours, uniform softmax
    np.testing.assert_array_equal(mask[0, 0, :M], 1.0)
    np.testing.assert_array_equal(mask[0, 0, M:], 0.0)
    np.testing.assert_allclose(alpha[0, 0, :M], 1.0 / M, rtol=1e-6)
    # tied row in batch 1
    np.testing.assert_array_equal(mask[1, 3, :M], 1.0)


def test_pallas_kernel_tie_break_matches(rng):
    """The Pallas rank formulation agrees with masked_neighbourhood on
    tied rows."""
    from vqa_project_tpu.ops.pallas import (
        edge_aggregate_reference,
        fused_edge_aggregate,
    )

    adj = np.zeros((1, K, K), np.float32)  # fully tied everywhere
    pseudo = np.stack(
        [rng.uniform(0, 1, size=(1, K, K)),
         rng.uniform(-np.pi, np.pi, size=(1, K, K))], axis=-1
    ).astype(np.float32)
    proj = rng.normal(size=(1, K, N_KERN * 4)).astype(np.float32)
    gparams = np.stack([rng.uniform(0.1, 1, N_KERN) for _ in range(4)]
                       ).astype(np.float32)
    got = np.asarray(fused_edge_aggregate(
        jnp.asarray(adj), jnp.asarray(pseudo), jnp.asarray(proj),
        jnp.asarray(gparams), M, True, True))
    want = np.asarray(edge_aggregate_reference(
        jnp.asarray(adj), jnp.asarray(pseudo), jnp.asarray(proj),
        jnp.asarray(gparams), m=M, use_alpha=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
