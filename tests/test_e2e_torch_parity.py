"""END-TO-END parity: the flax model under an imported torch state_dict
produces the same logits and adjacency as a torch functional oracle.

The oracle below is an independent functional re-derivation of the
conditioned-graph forward pass using stock torch.nn.functional ops and a
state_dict (no reference code): packed GRU, weight-normed linears,
polar pseudo-coordinates, top-m softmax neighbourhood with gather,
Gaussian kernel weights normalized across kernels, gather-based
per-kernel convolution. It intentionally uses the SPARSE formulation so
this test also re-proves the dense-masked equivalence at full-model
scope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_model import CFG, make_batch
from tests.test_torch_import import _make_torch_state_dict
from vqa_project_tpu.models import GraphVQAModel
from vqa_project_tpu.models.torch_import import import_torch_state_dict


def _wn_linear(sd, prefix, x):
    v = sd[f"{prefix}.weight_v"]
    g = sd[f"{prefix}.weight_g"]
    w = g * v / v.norm(dim=1, keepdim=True)
    return F.linear(x, w, sd[f"{prefix}.bias"])


def _gaussian(sd, conv, pseudo):
    """pseudo (B, K, m, 2) -> (B, K, m, n) kernel weights."""
    rho = pseudo[..., 0:1]
    theta = pseudo[..., 1:2]
    mu_r = sd[f"{conv}.mean_rho"].reshape(-1)
    mu_t = sd[f"{conv}.mean_theta"].reshape(-1)
    pr = sd[f"{conv}.precision_rho"].reshape(-1)
    pt = sd[f"{conv}.precision_theta"].reshape(-1)
    w_r = torch.exp(-0.5 * (rho - mu_r) ** 2 / (1e-14 + pr**2))
    d = torch.abs(theta - mu_t)
    d = torch.minimum(d, torch.abs(2 * torch.pi - d))
    w_t = torch.exp(-0.5 * d**2 / (1e-14 + pt**2))
    w = w_r * w_t
    w = torch.nan_to_num(w, nan=0.0)
    return w / w.sum(-1, keepdim=True)


def _conv(sd, conv, neigh_feats, gw):
    """neigh_feats (B, K, m, F), gw (B, K, m, n) -> (B, K, out)."""
    agg = torch.einsum("bkmn,bkmf->bknf", gw, neigh_feats)
    outs = []
    i = 0
    while f"{conv}.conv_weights.{i}.weight" in sd:
        w = sd[f"{conv}.conv_weights.{i}.weight"]
        outs.append(F.linear(agg[:, :, i], w))
        i += 1
    return torch.cat(outs, dim=-1)


def _manual_gru(sd, emb, lens):
    """Differentiable GRU: torch gate math by hand (a stock nn.GRU fed
    via .data assignment severs autograd to the sd tensors), hidden
    taken at each sequence's last valid step like pack_padded."""
    wi, wh = sd["q_gru.weight_ih_l0"], sd["q_gru.weight_hh_l0"]
    bi, bh = sd["q_gru.bias_ih_l0"], sd["q_gru.bias_hh_l0"]
    b, t, _ = emb.shape
    h = wh.shape[1]
    hid = torch.zeros(b, h, dtype=emb.dtype)
    for step in range(t):
        gi = emb[:, step] @ wi.T + bi
        gh = hid @ wh.T + bh
        i_r, i_z, i_n = gi.chunk(3, -1)
        h_r, h_z, h_n = gh.chunk(3, -1)
        r = torch.sigmoid(i_r + h_r)
        z = torch.sigmoid(i_z + h_z)
        n = torch.tanh(i_n + r * h_n)
        new = (1 - z) * n + z * hid
        live = (lens > step).unsqueeze(-1).to(emb.dtype)
        hid = live * new + (1 - live) * hid
    return hid


def torch_oracle_forward(sd, question, image, qlen, m,
                         differentiable=False):
    """Eval-mode forward; returns (logits, adjacency) as numpy, or as
    live tensors differentiable w.r.t. the sd values when
    differentiable=True (used by the Adam-resume parity test)."""
    import contextlib

    ctx = (contextlib.nullcontext() if differentiable
           else torch.no_grad())
    with ctx:
        q = torch.from_numpy(np.array(question)).long()
        img = torch.from_numpy(np.array(image)).float()
        lens = torch.from_numpy(np.array(qlen)).long()
        b, k, _ = img.shape

        # question encoding (packed GRU through a stock module, or the
        # hand-written differentiable equivalent)
        emb = F.embedding(q, sd["wembed.weight"])
        h = sd["q_gru.weight_hh_l0"].shape[1]
        if differentiable:
            qenc = _manual_gru(sd, emb, lens)
        else:
            gru = torch.nn.GRU(input_size=emb.shape[-1], hidden_size=h)
            gru.weight_ih_l0.data = sd["q_gru.weight_ih_l0"]
            gru.weight_hh_l0.data = sd["q_gru.weight_hh_l0"]
            gru.bias_ih_l0.data = sd["q_gru.bias_ih_l0"]
            gru.bias_hh_l0.data = sd["q_gru.bias_hh_l0"]
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                emb, lens, batch_first=True, enforce_sorted=False)
            _, hid = gru(packed)
            qenc = hid[0]                                 # (B, H)

        # polar pseudo-coordinates from bbox centres
        bb = img[..., -4:]
        centre = bb[..., :2] + 0.5 * (bb[..., 2:] - bb[..., :2])
        diff = centre[:, :, None, :] - centre[:, None, :, :]
        rho = torch.sqrt(diff[..., 0] ** 2 + diff[..., 1] ** 2)
        theta = torch.atan2(diff[..., 0], diff[..., 1])
        pseudo = torch.stack([rho, theta], dim=-1)        # (B, K, K, 2)

        # adjacency from [feat || qenc]
        nodes = torch.cat(
            [img, qenc[:, None, :].expand(b, k, h)], dim=-1)
        e = F.relu(_wn_linear(sd, "adjacency_1.edge_layer_1", nodes))
        e = F.relu(_wn_linear(sd, "adjacency_1.edge_layer_2", e))
        adjacency = e @ e.transpose(1, 2)                 # (B, K, K)

        # top-m neighbourhood
        vals, idx = torch.topk(adjacency, m, dim=-1)
        alpha = F.softmax(vals, dim=-1)                   # (B, K, m)
        gather = lambda t: torch.gather(
            t.unsqueeze(1).expand(b, k, k, t.shape[-1]), 2,
            idx.unsqueeze(-1).expand(b, k, m, t.shape[-1]))
        npseudo = torch.gather(
            pseudo, 2, idx.unsqueeze(-1).expand(b, k, m, 2))

        # conv 1 (alpha-weighted)
        neigh1 = gather(img) * alpha.unsqueeze(-1)
        gw1 = _gaussian(sd, "graph_convolution_1", npseudo)
        hg1 = F.relu(_conv(sd, "graph_convolution_1", neigh1, gw1))

        # conv 2 (unweighted)
        neigh2 = gather(hg1)
        gw2 = _gaussian(sd, "graph_convolution_2", npseudo)
        hg2 = F.relu(_conv(sd, "graph_convolution_2", neigh2, gw2))

        pooled = hg2.max(dim=1).values
        fused = F.relu(qenc) * pooled
        h1 = F.relu(_wn_linear(sd, "out_1", fused))
        logits = _wn_linear(sd, "out_2", h1)
        if differentiable:
            return logits, adjacency
        return logits.numpy(), adjacency.numpy()


def test_full_model_matches_torch_oracle(rng):
    sd = _make_torch_state_dict(CFG)
    params = import_torch_state_dict(sd)
    model = GraphVQAModel(cfg=CFG)  # CFG is float32 compute

    q, image, qlen = make_batch(rng, b=5)
    logits_j, adj_j, _ = model.apply(params, q, image, qlen)

    logits_t, adj_t = torch_oracle_forward(
        sd, q, image, qlen, CFG.neighbourhood_size)

    np.testing.assert_allclose(np.asarray(adj_j), adj_t,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-3, atol=1e-3)
    # predictions identical
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits_j, -1)), logits_t.argmax(-1))


def test_pallas_model_matches_torch_oracle(rng):
    """Same oracle, fused-Pallas model path (interpret mode)."""
    import dataclasses

    sd = _make_torch_state_dict(CFG)
    params = import_torch_state_dict(sd)
    model = GraphVQAModel(cfg=dataclasses.replace(CFG, use_pallas=True))

    q, image, qlen = make_batch(rng, b=4)
    logits_j, adj_j, _ = model.apply(params, q, image, qlen)
    logits_t, adj_t = torch_oracle_forward(
        sd, q, image, qlen, CFG.neighbourhood_size)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits_j, -1)), logits_t.argmax(-1))
