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
                                         -> conv_kernels[:, i*d:(i+1)*d]
                                            (transposed, column-concat)
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
            # fused (in, out): column block n*d:(n+1)*d is kernel n
            # (see GraphConvolution — plain-GEMM projection layout)
            "conv_kernels": np.concatenate(kernels, axis=1),
            "mean_rho": _np(sd[f"{conv}.mean_rho"]).reshape(-1),
            "mean_theta": _np(sd[f"{conv}.mean_theta"]).reshape(-1),
            "precision_rho": _np(sd[f"{conv}.precision_rho"]).reshape(-1),
            "precision_theta":
                _np(sd[f"{conv}.precision_theta"]).reshape(-1),
        }

    params["out_1"] = _wn(sd, "out_1")
    params["out_2"] = _wn(sd, "out_2")
    return {"params": params}


def import_torch_optimizer(ckpt: Dict, opt_state_template):
    """Splice a torch Adam state_dict into an optax.adam state.

    ckpt is the reference's full-dict checkpoint (run.py:176-181):
    {'epoch', 'state_dict', 'optimizer', ...}. torch keys its Adam state
    by PARAMETER INDEX in model.parameters() order; for this model
    (no buffers anywhere) that order equals the state_dict key order,
    so index i maps to the i-th state_dict name. Each exp_avg /
    exp_avg_sq tensor mirrors its parameter's shape and therefore needs
    the SAME transposes/reshapes as the parameter import — we reuse
    import_torch_state_dict on synthetic name->moment dicts.

    Returns a new opt_state with count/mu/nu (ScaleByAdamState) and the
    LR-schedule count replaced; raises KeyError/ValueError when the
    checkpoint has no usable optimizer state.
    """
    import jax
    import jax.numpy as jnp
    import optax

    sd = ckpt["state_dict"]
    opt_sd = ckpt.get("optimizer") or {}
    state = opt_sd.get("state") or {}
    if not state:
        raise ValueError("checkpoint carries no optimizer state")

    order = list(sd.keys())
    first = next(iter(state.values()))
    if "exp_avg" not in first:
        raise ValueError("optimizer state is not Adam-shaped "
                         f"(fields: {sorted(first)})")
    mu_sd = {order[int(i)]: s["exp_avg"] for i, s in state.items()}
    nu_sd = {order[int(i)]: s["exp_avg_sq"] for i, s in state.items()}
    mu = import_torch_state_dict(mu_sd)
    nu = import_torch_state_dict(nu_sd)
    # torch keeps a per-param step (a 0-d tensor in newer versions);
    # they advance in lockstep under the reference loop, optax keeps one
    counts = {int(_np(s["step"]).reshape(())) for s in state.values()}
    if len(counts) > 1:
        raise ValueError(f"per-param Adam steps disagree: {sorted(counts)}")
    count = counts.pop()

    def fix_tree(moments, template):
        # match leaf dtypes/types of the template (plain np -> jnp)
        return jax.tree.map(
            lambda m, t: jnp.asarray(m, dtype=t.dtype), moments, template)

    new_state = []
    spliced = 0
    for s in opt_state_template:
        if isinstance(s, optax.ScaleByAdamState):
            s = s._replace(
                count=jnp.asarray(count, s.count.dtype),
                mu=fix_tree(mu, s.mu), nu=fix_tree(nu, s.nu))
            spliced += 1
        elif isinstance(s, optax.ScaleByScheduleState):
            # the MultiStepLR-equivalent schedule indexes by step count
            s = s._replace(count=jnp.asarray(count, s.count.dtype))
        new_state.append(s)
    if spliced != 1:
        raise ValueError(
            f"expected exactly one ScaleByAdamState, found {spliced}")
    return tuple(new_state)


def load_torch_checkpoint(path: str, opt_state_template=None):
    """torch.load a reference .pt file and convert (torch required).

    Returns the params tree; with opt_state_template (an optax.adam
    state from make_optimizer(...).init) ALSO returns
    (params, opt_state_or_None, epoch) so `--train --model_path ref.pt`
    resumes optimizer-identically to the reference's
    optimizer.load_state_dict (run.py:176-181).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = import_torch_state_dict(sd)
    if opt_state_template is None:
        return params
    opt_state, epoch = None, 0
    if isinstance(sd, dict) and "state_dict" in sd:
        epoch = int(sd.get("epoch", 0))
        try:
            opt_state = import_torch_optimizer(sd, opt_state_template)
        except (KeyError, ValueError) as e:
            print(f"torch checkpoint: optimizer state not imported ({e}); "
                  "optimizer restarts fresh", flush=True)
    return params, opt_state, epoch


# --- reverse direction: export to the reference's on-disk format -------

def _wn_export(sd: Dict, prefix: str, leaf: Dict) -> None:
    """Inverse of _wn: emit legacy weight_norm names (weight_g (out,1),
    weight_v (out,in)) — the naming the reference's torch.load expects
    (utils.py:44 saves module.state_dict() of weight_norm'd Linears)."""
    sd[f"{prefix}.weight_g"] = np.asarray(leaf["g"],
                                          np.float32).reshape(-1, 1)
    sd[f"{prefix}.weight_v"] = np.asarray(leaf["v"], np.float32).T
    if "b" in leaf:
        sd[f"{prefix}.bias"] = np.asarray(leaf["b"], np.float32)


def export_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Convert the flax parameter tree back into a reference-format
    state_dict (exact inverse of import_torch_state_dict): torch Linear
    (out, in) orientation, (n, 1) Gaussian parameter shapes, and the
    fused (in, out) conv_kernels split back into n stacked
    conv_weights.{i}.weight matrices. Lets a trained TPU checkpoint be
    loaded by the reference's eval/plot stack
    (/root/reference/run.py:84-86 model.load_state_dict)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}
    sd["wembed.weight"] = np.asarray(p["wembed"], np.float32)
    sd["q_gru.weight_ih_l0"] = np.asarray(p["gru_w_ih"], np.float32)
    sd["q_gru.weight_hh_l0"] = np.asarray(p["gru_w_hh"], np.float32)
    sd["q_gru.bias_ih_l0"] = np.asarray(p["gru_b_ih"], np.float32)
    sd["q_gru.bias_hh_l0"] = np.asarray(p["gru_b_hh"], np.float32)
    for n in ("edge_layer_1", "edge_layer_2"):
        _wn_export(sd, f"adjacency_1.{n}", p["adjacency_1"][n])
    for conv in ("graph_convolution_1", "graph_convolution_2"):
        leaf = p[conv]
        n_kernels = int(np.asarray(leaf["mean_rho"]).shape[0])
        fused = np.asarray(leaf["conv_kernels"], np.float32)  # (in, out)
        d = fused.shape[1] // n_kernels
        for i in range(n_kernels):
            sd[f"{conv}.conv_weights.{i}.weight"] = \
                fused[:, i * d:(i + 1) * d].T          # (out/n, in)
        for g in ("mean_rho", "mean_theta", "precision_rho",
                  "precision_theta"):
            sd[f"{conv}.{g}"] = np.asarray(leaf[g],
                                           np.float32).reshape(-1, 1)
    _wn_export(sd, "out_1", p["out_1"])
    _wn_export(sd, "out_2", p["out_2"])
    return sd


def save_torch_checkpoint(path: str, params: Dict) -> None:
    """torch.save the exported state_dict (torch required) — the bare
    state_dict format of /root/reference/utils.py:34-44."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params).items()}
    torch.save(sd, path)
