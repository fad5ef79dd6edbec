"""Import a PyTorch reference checkpoint into the flax parameter tree.

Parity requirement (SURVEY.md section 5, checkpoint row): the loader must
be able to ingest the reference's torch state_dicts
(vqa_{n_obj}_{n_kernels}_{neigh}_{acc}.pt, bare state_dict format of
/root/reference/utils.py:44) so learned adjacencies / accuracies can be
validated against the original.

Key mapping (torch module names from sparse_graph_model.py/layers.py):
  wembed.weight                          -> wembed
  q_gru.{weight,bias}_{ih,hh}_l0         -> gru_{w,b}_{ih,hh}
  adjacency_1.edge_layer_{1,2}.weight_v  -> adjacency_1/edge_layer_N/v (T)
  adjacency_1.edge_layer_{1,2}.weight_g  -> .../g  ((out,1) -> (out,))
  adjacency_1.edge_layer_{1,2}.bias      -> .../b
  graph_convolution_{1,2}.conv_weights.{i}.weight
                                         -> conv_kernels[i] (transposed)
  graph_convolution_{1,2}.{mean,precision}_{rho,theta} ((n,1) -> (n,))
  out_{1,2}.{weight_v,weight_g,bias}     -> out_N/{v,g,b}

torch Linear weights are (out, in); flax kernels are (in, out) — every
matrix is transposed. Both the legacy weight_norm naming (weight_g/
weight_v) and the parametrize naming (parametrizations.weight.original0/1)
are accepted.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _wn(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """Extract weight-norm (g, v, b) for one Linear, both naming styles."""
    if f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    else:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    out = {"g": g.reshape(-1), "v": v.T}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"])
    return out


def import_torch_state_dict(state_dict: Dict) -> Dict:
    """Convert a reference torch state_dict into {'params': {...}}."""
    sd = state_dict
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]  # full-dict checkpoint format (run.py:176-181)

    params: Dict = {}
    params["wembed"] = _np(sd["wembed.weight"])
    params["gru_w_ih"] = _np(sd["q_gru.weight_ih_l0"])
    params["gru_w_hh"] = _np(sd["q_gru.weight_hh_l0"])
    params["gru_b_ih"] = _np(sd["q_gru.bias_ih_l0"])
    params["gru_b_hh"] = _np(sd["q_gru.bias_hh_l0"])

    params["adjacency_1"] = {
        "edge_layer_1": _wn(sd, "adjacency_1.edge_layer_1"),
        "edge_layer_2": _wn(sd, "adjacency_1.edge_layer_2"),
    }

    for conv in ("graph_convolution_1", "graph_convolution_2"):
        kernels = []
        i = 0
        while f"{conv}.conv_weights.{i}.weight" in sd:
            w = _np(sd[f"{conv}.conv_weights.{i}.weight"])  # (out/n, in)
            kernels.append(w.T)                             # (in, out/n)
            i += 1
        if not kernels:
            raise KeyError(f"no conv_weights found under {conv}")
        params[conv] = {
            "conv_kernels": np.stack(kernels),              # (n, in, out/n)
            "mean_rho": _np(sd[f"{conv}.mean_rho"]).reshape(-1),
            "mean_theta": _np(sd[f"{conv}.mean_theta"]).reshape(-1),
            "precision_rho": _np(sd[f"{conv}.precision_rho"]).reshape(-1),
            "precision_theta":
                _np(sd[f"{conv}.precision_theta"]).reshape(-1),
        }

    params["out_1"] = _wn(sd, "out_1")
    params["out_2"] = _wn(sd, "out_2")
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict:
    """torch.load a reference .pt file and convert (torch required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_torch_state_dict(sd)
