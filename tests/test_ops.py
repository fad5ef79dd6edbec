"""Unit tests for core ops against independent numpy/torch oracles.

Oracles re-derive the reference semantics (documented in each op's
docstring) from the math, in numpy — they are not translations of the
reference code.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vqa_project_tpu.ops import (
    bbox_centres,
    dense_neighbourhood_weights,
    gaussian_kernel_weights,
    graph_convolution,
    multilabel_soft_margin_loss,
    polar_pseudo_coords,
    scatter_to_dense,
    topk_edge_softmax,
    vqa_score,
)

B, K, M, N_KERN, F = 3, 12, 5, 4, 24


def test_bbox_centres(rng):
    feats = rng.normal(size=(B, K, 20)).astype(np.float32)
    out = np.asarray(bbox_centres(jnp.asarray(feats)))
    bb = feats[..., -4:]
    expected = np.stack(
        [(bb[..., 0] + bb[..., 2]) / 2, (bb[..., 1] + bb[..., 3]) / 2],
        axis=-1,
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_polar_pseudo_coords(rng):
    centres = rng.uniform(size=(B, K, 2)).astype(np.float32)
    out = np.asarray(polar_pseudo_coords(jnp.asarray(centres)))
    assert out.shape == (B, K, K, 2)
    for b in range(B):
        for i in range(K):
            for j in range(K):
                dx = centres[b, i, 0] - centres[b, j, 0]
                dy = centres[b, i, 1] - centres[b, j, 1]
                assert out[b, i, j, 0] == pytest.approx(
                    math.hypot(dx, dy), abs=1e-5)
                # reference angle convention: atan2(dx, dy)
                assert out[b, i, j, 1] == pytest.approx(
                    math.atan2(dx, dy), abs=1e-5)


def test_gaussian_kernel_weights(rng):
    pseudo = np.stack(
        [rng.uniform(0, 1.5, size=(B, K, M)),
         rng.uniform(-math.pi, math.pi, size=(B, K, M))],
        axis=-1,
    ).astype(np.float32)
    mu_r = rng.uniform(0, 1, N_KERN).astype(np.float32)
    mu_t = rng.uniform(-math.pi, math.pi, N_KERN).astype(np.float32)
    pr = rng.uniform(0, 1, N_KERN).astype(np.float32)
    pt = rng.uniform(0, 1, N_KERN).astype(np.float32)

    out = np.asarray(gaussian_kernel_weights(
        jnp.asarray(pseudo), jnp.asarray(mu_r), jnp.asarray(mu_t),
        jnp.asarray(pr), jnp.asarray(pt)))

    # Oracle: per-edge product of rho/theta gaussians, normalized over
    # the kernel axis (see ops/gaussian.py docstring for semantics).
    rho = pseudo[..., 0][..., None]
    theta = pseudo[..., 1][..., None]
    w_rho = np.exp(-0.5 * (rho - mu_r) ** 2 / (1e-14 + pr**2))
    d = np.abs(theta - mu_t)
    d = np.minimum(d, np.abs(2 * math.pi - d))
    w_theta = np.exp(-0.5 * d**2 / (1e-14 + pt**2))
    w = w_rho * w_theta
    w = w / w.sum(-1, keepdims=True)
    np.testing.assert_allclose(out, w, rtol=1e-5, atol=1e-6)
    # normalized across kernels
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_topk_edge_softmax(rng):
    adj = rng.normal(size=(B, K, K)).astype(np.float32)
    alpha, idx = topk_edge_softmax(jnp.asarray(adj), M)
    alpha, idx = np.asarray(alpha), np.asarray(idx)
    assert alpha.shape == (B, K, M) and idx.shape == (B, K, M)
    for b in range(B):
        for i in range(K):
            order = np.argsort(adj[b, i])[::-1][:M]
            assert set(idx[b, i].tolist()) == set(order.tolist())
            vals = adj[b, i, idx[b, i]]
            sm = np.exp(vals - vals.max())
            sm /= sm.sum()
            np.testing.assert_allclose(alpha[b, i], sm, rtol=1e-5)


def test_scatter_to_dense(rng):
    vals = rng.normal(size=(B, K, M)).astype(np.float32)
    idx = np.stack(
        [np.stack([rng.choice(K, size=M, replace=False) for _ in range(K)])
         for _ in range(B)]
    ).astype(np.int32)
    dense = np.asarray(scatter_to_dense(jnp.asarray(vals), jnp.asarray(idx), K))
    expected = np.zeros((B, K, K), np.float32)
    for b in range(B):
        for i in range(K):
            for s in range(M):
                expected[b, i, idx[b, i, s]] += vals[b, i, s]
    np.testing.assert_allclose(dense, expected, rtol=1e-5, atol=1e-6)


def test_dense_graph_conv_matches_gather_formulation(rng):
    """Dense masked-matmul conv == the reference's gather-then-bmm.

    Oracle implements the sparse formulation: gather top-m neighbour
    features, weight by (alpha *) gaussian kernel weights, sum over
    neighbours, then per-kernel projection and concat.
    """
    feats = rng.normal(size=(B, K, F)).astype(np.float32)
    alpha = rng.uniform(size=(B, K, M)).astype(np.float32)
    idx = np.stack(
        [np.stack([rng.choice(K, size=M, replace=False) for _ in range(K)])
         for _ in range(B)]
    ).astype(np.int32)
    gw = rng.uniform(size=(B, K, M, N_KERN)).astype(np.float32)
    out_dim = 16
    kernels = rng.normal(size=(N_KERN, F, out_dim // N_KERN)).astype(
        np.float32) * 0.1

    for weight_by_alpha in (True, False):
        dense_w = dense_neighbourhood_weights(
            jnp.asarray(alpha), jnp.asarray(idx), jnp.asarray(gw), K,
            weight_by_alpha)
        fused = jnp.asarray(kernels.transpose(1, 0, 2)
                            .reshape(kernels.shape[1], -1))
        got = np.asarray(graph_convolution(
            jnp.asarray(feats), dense_w, fused,
            compute_dtype=jnp.float32))

        # sparse oracle
        gathered = feats[np.arange(B)[:, None, None], idx]  # (B,K,M,F)
        if weight_by_alpha:
            gathered = gathered * alpha[..., None]
        # per-kernel weighted sum over neighbours -> (B,K,N_KERN,F)
        agg = np.einsum("bkmn,bkmf->bknf", gw, gathered)
        proj = np.einsum("bknf,nfo->bkno", agg, kernels)
        expected = proj.reshape(B, K, out_dim)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_multilabel_soft_margin_loss_matches_torch(rng):
    logits = rng.normal(size=(B, 17)).astype(np.float32)
    targets = rng.uniform(size=(B, 17)).astype(np.float32)
    got = float(multilabel_soft_margin_loss(
        jnp.asarray(logits), jnp.asarray(targets)))
    expected = torch.nn.MultiLabelSoftMarginLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()
    assert got == pytest.approx(expected, rel=1e-5)


def test_vqa_score(rng):
    logits = rng.normal(size=(B, 9)).astype(np.float32)
    votes = rng.integers(0, 10, size=(B, 9)).astype(np.float32)
    got = float(vqa_score(jnp.asarray(logits), jnp.asarray(votes)))
    expected = sum(
        min(votes[i, int(np.argmax(logits[i]))] / 3.0, 1.0)
        for i in range(B)
    )
    assert got == pytest.approx(expected, rel=1e-5)


def test_ops_are_jittable(rng):
    adj = jnp.asarray(rng.normal(size=(B, K, K)).astype(np.float32))

    @jax.jit
    def f(a):
        alpha, idx = topk_edge_softmax(a, M)
        return scatter_to_dense(alpha, idx, K)

    out = f(adj)
    assert out.shape == (B, K, K)
