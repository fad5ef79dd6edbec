"""Torch checkpoint import + weight-norm layer parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vqa_project_tpu.config import ModelConfig
from vqa_project_tpu.models import GraphVQAModel, WeightNormDense
from vqa_project_tpu.models.torch_import import import_torch_state_dict


def test_weight_norm_dense_matches_torch(rng):
    """WeightNormDense == nn.utils.weight_norm(nn.Linear) numerically."""
    in_dim, out_dim, b = 20, 12, 5
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(in_dim, out_dim))
    # perturb g so the test isn't trivially w == v
    with torch.no_grad():
        lin.weight_g.mul_(torch.linspace(0.5, 2.0, out_dim).reshape(-1, 1))
    x = rng.normal(size=(b, in_dim)).astype(np.float32)
    with torch.no_grad():
        expected = lin(torch.from_numpy(x)).numpy()

    layer = WeightNormDense(out_dim, compute_dtype=jnp.float32)
    params = {
        "params": {
            "v": np.asarray(lin.weight_v.detach().numpy()).T,
            "g": lin.weight_g.detach().numpy().reshape(-1),
            "b": lin.bias.detach().numpy(),
        }
    }
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def _make_torch_state_dict(cfg: ModelConfig):
    """Stock-torch parameter tensors with the reference's state_dict key
    names and shapes (no reference code involved)."""
    g = torch.Generator().manual_seed(7)
    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    h, e, f, c = cfg.hid_dim, cfg.emb_dim, cfg.feat_dim, cfg.combined_dim
    n, out = cfg.n_kernels, cfg.out_dim
    sd = {
        "wembed.weight": t(cfg.vocab_size, e),
        "q_gru.weight_ih_l0": t(3 * h, e),
        "q_gru.weight_hh_l0": t(3 * h, h),
        "q_gru.bias_ih_l0": t(3 * h),
        "q_gru.bias_hh_l0": t(3 * h),
    }
    for name, ind in (("adjacency_1.edge_layer_1", f + h),
                      ("adjacency_1.edge_layer_2", c)):
        sd[f"{name}.weight_g"] = torch.rand(c, 1, generator=g) + 0.5
        sd[f"{name}.weight_v"] = t(c, ind)
        sd[f"{name}.bias"] = t(c)
    for conv, ind, od in (("graph_convolution_1", f, 2 * h),
                          ("graph_convolution_2", 2 * h, h)):
        for i in range(n):
            sd[f"{conv}.conv_weights.{i}.weight"] = t(od // n, ind)
        for p in ("mean_rho", "mean_theta", "precision_rho",
                  "precision_theta"):
            sd[f"{conv}.{p}"] = torch.rand(n, 1, generator=g)
    for name, ind, od in (("out_1", h, out), ("out_2", out, out)):
        sd[f"{name}.weight_g"] = torch.rand(od, 1, generator=g) + 0.5
        sd[f"{name}.weight_v"] = t(od, ind)
        sd[f"{name}.bias"] = t(od)
    return sd


def test_import_round_trips_into_model(rng):
    from tests.test_model import CFG, make_batch

    sd = _make_torch_state_dict(CFG)
    tree = import_torch_state_dict(sd)

    model = GraphVQAModel(cfg=CFG)
    q, image, qlen = make_batch(rng)
    init = model.init(jax.random.key(0), q, image, qlen)

    # identical tree structure and shapes
    flat_init = jax.tree_util.tree_leaves_with_path(init)
    flat_imp = jax.tree_util.tree_leaves_with_path(tree)
    paths_i = [jax.tree_util.keystr(p) for p, _ in flat_init]
    paths_m = [jax.tree_util.keystr(p) for p, _ in flat_imp]
    assert sorted(paths_i) == sorted(paths_m)
    shapes_i = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    for p, v in flat_imp:
        assert v.shape == shapes_i[jax.tree_util.keystr(p)], p

    # forward runs and is finite
    logits, adj, _ = model.apply(tree, q, image, qlen)
    assert np.isfinite(np.asarray(logits)).all()

    # weight-norm conversion preserved direction*scale: check one layer
    w_torch = (sd["out_1.weight_g"] /
               sd["out_1.weight_v"].norm(dim=1, keepdim=True)
               ) * sd["out_1.weight_v"]
    x = rng.normal(size=(3, CFG.hid_dim)).astype(np.float32)
    expected = x @ w_torch.numpy().T + sd["out_1.bias"].numpy()
    layer = WeightNormDense(CFG.out_dim, compute_dtype=jnp.float32)
    got = np.asarray(layer.apply(
        {"params": tree["params"]["out_1"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_full_dict_checkpoint_format():
    """run.py:176-181 full-dict checkpoints ({'state_dict': ...}) are
    accepted transparently."""
    from tests.test_model import CFG

    sd = _make_torch_state_dict(CFG)
    wrapped = {"epoch": 3, "state_dict": sd, "optimizer": {}}
    tree = import_torch_state_dict(wrapped)
    assert tree["params"]["wembed"].shape == (CFG.vocab_size, CFG.emb_dim)


def test_both_on_disk_formats_roundtrip(tmp_path, rng):
    """The reference writes two .pt formats: the full dict
    {epoch, loss, accuracy, state_dict, optimizer} consumed by train
    resume (run.py:176-181) and the bare state_dict written by save()
    (utils.py:44). Both must load through load_torch_checkpoint (a real
    torch.save/torch.load round trip) and produce identical logits."""
    from tests.test_model import CFG, make_batch
    from vqa_project_tpu.models.torch_import import load_torch_checkpoint

    sd = _make_torch_state_dict(CFG)

    bare = str(tmp_path / "bare_state_dict.pt")
    torch.save(sd, bare)

    # a real torch optimizer state_dict, as run.py stores it
    dummy = torch.nn.Linear(4, 4)
    opt = torch.optim.Adam(dummy.parameters(), lr=1e-4)
    opt.step()  # no grads -> empty state, but schema is real
    full = str(tmp_path / "full_dict.pt")
    torch.save({"epoch": 7, "loss": 0.5, "accuracy": 42.0,
                "state_dict": sd, "optimizer": opt.state_dict()}, full)

    tree_bare = load_torch_checkpoint(bare)
    tree_full = load_torch_checkpoint(full)

    flat_b = jax.tree_util.tree_leaves_with_path(tree_bare)
    flat_f = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(tree_full)}
    for p, v in flat_b:
        np.testing.assert_array_equal(v, flat_f[jax.tree_util.keystr(p)])

    model = GraphVQAModel(cfg=CFG)
    q, image, qlen = make_batch(rng)
    logits_b, _, _ = model.apply(tree_bare, q, image, qlen)
    logits_f, _, _ = model.apply(tree_full, q, image, qlen)
    np.testing.assert_array_equal(np.asarray(logits_b),
                                  np.asarray(logits_f))
    assert np.isfinite(np.asarray(logits_b)).all()


def test_validate_parity_cli(tmp_path, monkeypatch):
    """The parity-eval CLI runs end-to-end over a synthetic dataset with
    a synthetic torch checkpoint."""
    import json as _json

    from tests.test_model import CFG
    from vqa_project_tpu.cli.validate_parity import main
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa

    d = str(tmp_path / "data")
    generate_synthetic_vqa(d, n_images=4, n_questions=16, n_obj=CFG.n_obj,
                           feat_dim=CFG.feat_dim - 4,
                           q_vocab=CFG.vocab_size - 1 - 9,
                           n_answers=CFG.out_dim - 1)
    # torch checkpoint with matching dims (vocab from dataset)
    import dataclasses

    from vqa_project_tpu.data import GraphVQADataset

    ds = GraphVQADataset.vqa2(d, "train", n_obj=CFG.n_obj, max_qlen=16)
    cfg = dataclasses.replace(CFG, vocab_size=ds.q_words,
                              out_dim=ds.n_answers, emb_dim=300,
                              max_qlen=16)
    sd = _make_torch_state_dict(cfg)
    ckpt = str(tmp_path / "ref.pt")
    torch.save(sd, ckpt)

    monkeypatch.chdir(tmp_path)
    main(["--model_path", ckpt, "--data_dir", d, "--split", "train",
          "--bsize", "8", "--hid", str(cfg.hid_dim),
          "--n_kernels", str(cfg.n_kernels),
          "--neighbourhood_size", str(cfg.neighbourhood_size),
          "--n_obj", str(cfg.n_obj),
          "--combined_dim", str(cfg.combined_dim)])
    result = _json.load(open(tmp_path / "result.json"))
    assert len(result) == 12  # generator puts 75% of questions in train


def test_adam_state_import_one_step_parity(rng, tmp_path):
    """VERDICT r2 item 5 'done' criterion: resuming --train FROM a
    reference full-dict checkpoint restores the Adam moments — one
    post-resume jax step lands on the same parameters as the
    torch-resumed step on the same batch, and measurably differs from a
    fresh-optimizer step."""
    import optax
    import torch.nn.functional as F

    from tests.test_e2e_torch_parity import torch_oracle_forward
    from tests.test_model import CFG, make_batch
    from vqa_project_tpu.models.torch_import import load_torch_checkpoint
    from vqa_project_tpu.ops import multilabel_soft_margin_loss

    lr = 1e-3
    sd = {k: v.clone().requires_grad_(True)
          for k, v in _make_torch_state_dict(CFG).items()}
    opt = torch.optim.Adam(sd.values(), lr=lr)

    q, image, qlen = make_batch(rng, b=4)
    targets = rng.uniform(size=(4, CFG.out_dim)).astype(np.float32)
    t_targets = torch.from_numpy(targets)

    def torch_step():
        opt.zero_grad()
        logits, _ = torch_oracle_forward(
            sd, q, image, qlen, CFG.neighbourhood_size,
            differentiable=True)
        F.multilabel_soft_margin_loss(logits, t_targets).backward()
        opt.step()

    for _ in range(3):  # non-trivial moments before the checkpoint
        torch_step()

    ckpt = str(tmp_path / "full.pt")
    torch.save({"epoch": 2,
                "state_dict": {k: v.detach().clone()
                               for k, v in sd.items()},
                "optimizer": opt.state_dict()}, ckpt)

    # torch side: ONE more step = the reference's post-resume parameters
    torch_step()
    ref_params = import_torch_state_dict(
        {k: v.detach().clone() for k, v in sd.items()})

    # jax side: import ckpt (params + Adam state), take one step
    tx = optax.adam(lr)
    params = load_torch_checkpoint(ckpt)
    params2, opt_state, epoch = load_torch_checkpoint(
        ckpt, tx.init(params))
    assert epoch == 2 and opt_state is not None
    assert int(opt_state[0].count) == 3

    model = GraphVQAModel(cfg=CFG)

    def loss_fn(p):
        logits, _, _ = model.apply(p, q, image, qlen)
        return multilabel_soft_margin_loss(logits, jnp.asarray(targets))

    grads = jax.grad(loss_fn)(params2)

    def step_with(state0):
        updates, _ = tx.update(grads, state0, params2)
        return optax.apply_updates(params2, updates)

    got = step_with(opt_state)
    fresh = step_with(tx.init(params))

    flat_ref = {jax.tree_util.keystr(p): v for p, v
                in jax.tree_util.tree_leaves_with_path(ref_params)}
    worst_imported, worst_fresh = 0.0, 0.0
    for p, v in jax.tree_util.tree_leaves_with_path(got):
        key = jax.tree_util.keystr(p)
        r = flat_ref[key]
        np.testing.assert_allclose(np.asarray(v), r, rtol=2e-3,
                                   atol=5e-5, err_msg=key)
        worst_imported = max(worst_imported,
                             float(np.abs(np.asarray(v) - r).max()))
    for p, v in jax.tree_util.tree_leaves_with_path(fresh):
        r = flat_ref[jax.tree_util.keystr(p)]
        worst_fresh = max(worst_fresh,
                          float(np.abs(np.asarray(v) - r).max()))
    # the moments matter: a fresh optimizer lands visibly elsewhere
    assert worst_fresh > 10 * worst_imported, (worst_fresh, worst_imported)


def test_fit_resume_accepts_torch_full_dict(rng, tmp_path):
    """fit()'s resume path sniffs torch .pt files and restores params +
    Adam moments + epoch/step (native msgpack checkpoints keep working
    through the same helper)."""
    import optax
    import torch.nn.functional as F

    from tests.test_e2e_torch_parity import torch_oracle_forward
    from tests.test_model import CFG, make_batch
    from vqa_project_tpu.train.loop import _is_torch_file, _resume_checkpoint
    from vqa_project_tpu.train.state import TrainState, save_checkpoint

    sd = {k: v.clone().requires_grad_(True)
          for k, v in _make_torch_state_dict(CFG).items()}
    opt = torch.optim.Adam(sd.values(), lr=1e-3)
    q, image, qlen = make_batch(rng, b=2)
    logits, _ = torch_oracle_forward(sd, q, image, qlen,
                                     CFG.neighbourhood_size,
                                     differentiable=True)
    F.multilabel_soft_margin_loss(
        logits, torch.rand(2, CFG.out_dim)).backward()
    opt.step()

    ckpt = str(tmp_path / "ref_full.pt")
    torch.save({"epoch": 5,
                "state_dict": {k: v.detach().clone()
                               for k, v in sd.items()},
                "optimizer": opt.state_dict()}, ckpt)

    model = GraphVQAModel(cfg=CFG)
    params = model.init(jax.random.key(0), q, image, qlen)
    tx = optax.adam(1e-3)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.key(1))

    assert _is_torch_file(ckpt)
    epoch, skip, new_state = _resume_checkpoint(ckpt, state)
    assert epoch == 5
    assert skip == 0  # torch checkpoints never carry a mid-epoch mark
    assert int(new_state.opt_state[0].count) == 1
    assert int(new_state.step) == 1
    np.testing.assert_allclose(
        np.asarray(new_state.params["params"]["wembed"]),
        sd["wembed.weight"].detach().numpy(), rtol=1e-6)
    # the native msgpack lineage flows through the same helper
    native = str(tmp_path / "native.ckpt")
    save_checkpoint(native, new_state, epoch=9)
    assert not _is_torch_file(native)
    epoch2, skip2, state2 = _resume_checkpoint(native, state)
    assert epoch2 == 9 and skip2 == 0
    assert int(state2.opt_state[0].count) == 1


def test_export_inverts_import(tmp_path):
    """export_torch_state_dict is the exact inverse of
    import_torch_state_dict: same key set as the reference fixture,
    identical tensors after a torch.save/torch.load round trip, and a
    second import reproduces the identical flax tree."""
    from vqa_project_tpu.models.torch_import import (
        export_torch_state_dict, load_torch_checkpoint,
        save_torch_checkpoint)

    cfg = ModelConfig(vocab_size=30, emb_dim=12, feat_dim=20, hid_dim=16,
                      out_dim=10, combined_dim=8, n_kernels=4)
    sd_ref = _make_torch_state_dict(cfg)
    tree = import_torch_state_dict(sd_ref)
    sd_out = export_torch_state_dict(tree)

    assert set(sd_out) == set(sd_ref)
    for k in sd_ref:
        np.testing.assert_allclose(
            sd_out[k], np.asarray(sd_ref[k], np.float32),
            rtol=0, atol=0, err_msg=k)

    path = str(tmp_path / "exported.pt")
    save_torch_checkpoint(path, tree)
    loaded = torch.load(path, map_location="cpu", weights_only=True)
    assert set(loaded) == set(sd_ref)
    tree2 = load_torch_checkpoint(path)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(tree2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_from_framework_checkpoint(tmp_path):
    """End-to-end export surface: a framework msgpack checkpoint run
    through cli.export_torch produces a torch file whose re-import
    matches the original parameters."""
    from vqa_project_tpu.cli.export_torch import main as export_main
    from vqa_project_tpu.models.torch_import import load_torch_checkpoint
    from vqa_project_tpu.train.state import save_checkpoint
    from vqa_project_tpu.config import TrainConfig
    from vqa_project_tpu.train.state import create_train_state, \
        make_optimizer

    cfg = ModelConfig(vocab_size=30, emb_dim=12, feat_dim=20, hid_dim=16,
                      out_dim=10, combined_dim=8, n_kernels=4, n_obj=6,
                      neighbourhood_size=3, max_qlen=5,
                      compute_dtype="float32", use_pallas=False)
    model = GraphVQAModel(cfg=cfg)
    rng = np.random.default_rng(0)
    sample = {
        "question": rng.integers(1, cfg.vocab_size, (4, cfg.max_qlen)),
        "image": rng.normal(size=(4, cfg.n_obj, cfg.feat_dim)
                            ).astype(np.float32),
        "qlen": np.full((4,), cfg.max_qlen, np.int32),
    }
    state = create_train_state(
        model, cfg, make_optimizer(TrainConfig(), 10), sample, seed=2)
    src = str(tmp_path / "fw.pt")
    dst = str(tmp_path / "ref.pt")
    save_checkpoint(src, state, epoch=1)
    export_main([src, dst])
    tree = load_torch_checkpoint(dst)

    def by_key(t):
        return {jax.tree_util.keystr(path): leaf for path, leaf
                in jax.tree_util.tree_leaves_with_path(t)}

    got, want = by_key(tree), by_key(state.params)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=1e-7, err_msg=k)


def test_load_checkpoint_sniffs_torch_pt(tmp_path, rng):
    """The generic checkpoint loader accepts a reference .pt directly
    (day-1 smoke path: run.py --eval/--test, plot, serve all consume
    the published pretrained checkpoint without conversion)."""
    from tests.test_model import CFG, make_batch
    from vqa_project_tpu.train.state import is_torch_file, load_checkpoint

    sd = _make_torch_state_dict(CFG)
    pt = str(tmp_path / "vqa_36_8_16_66.20.pt")
    torch.save(sd, pt)
    assert is_torch_file(pt)

    payload, none_state = load_checkpoint(pt)
    assert none_state is None
    model = GraphVQAModel(cfg=CFG)
    q, image, qlen = make_batch(rng)
    logits, _, _ = model.apply(payload["params"], q, image, qlen)
    assert np.isfinite(np.asarray(logits)).all()

    # restore_params (the cli consumers' path) round-trips it too
    from vqa_project_tpu.cli.run import restore_params

    class _DS:  # minimal dataset stub for template init
        max_qlen, n_obj, feat_dim = CFG.max_qlen, CFG.n_obj, CFG.feat_dim

    params = restore_params(model, _DS, payload)
    logits2, _, _ = model.apply(params, q, image, qlen)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
