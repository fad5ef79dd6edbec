"""Tensor-parallel (2-D mesh) sharding: placement rules + training parity.

The reference has no multi-device support at all (SURVEY.md §2); these
tests pin the net-new model-parallel axis on the virtual 8-device CPU
mesh: parameters land where the rules say, and a dp×tp run learns the
same function as pure DP.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import Batcher, GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.parallel import make_mesh_2d, shard_state
from vqa_project_tpu.train.loop import build_model, fit
from vqa_project_tpu.train.state import create_train_state, make_optimizer

N_OBJ, FEAT = 8, 24

MCFG = ModelConfig(emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
                   neighbourhood_size=4, dropout=0.1, max_qlen=10,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_tp")
    # q_vocab/n_answers chosen so vocab (q_vocab+1=20) and out_dim
    # (n_answers+1=8) divide tp=2 — the divisible-dims regime where
    # every rule engages
    generate_synthetic_vqa(str(d), n_images=16, n_questions=256,
                           n_obj=N_OBJ, feat_dim=FEAT, q_vocab=19,
                           n_answers=7)
    return str(d)


def _spec_of(arr):
    return arr.sharding.spec


def test_mesh_2d_shape():
    mesh = make_mesh_2d(2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh_2d(3)


def test_shard_state_placement_rules(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=N_OBJ, max_qlen=10)
    model = build_model(MCFG, ds)
    tx = make_optimizer(TrainConfig(), 10)
    sample = next(iter(Batcher(ds, 16)))
    state = create_train_state(model, model.cfg, tx, sample, seed=0)
    mesh = make_mesh_2d(2)
    state = shard_state(state, mesh)

    p = state.params["params"]
    assert _spec_of(p["out_2"]["v"]) == P(None, "model")
    assert _spec_of(p["out_2"]["g"]) == P("model")
    assert _spec_of(p["gru_w_ih"]) == P("model", None)
    assert _spec_of(p["gru_b_hh"]) == P("model")
    assert _spec_of(p["graph_convolution_1"]["conv_kernels"]) == \
        P(None, "model")
    assert _spec_of(p["graph_convolution_2"]["mean_rho"]) == P("model")
    assert _spec_of(p["wembed"]) == P("model", None)
    assert _spec_of(p["adjacency_1"]["edge_layer_1"]["v"]) == P(None, "model")
    # Adam moments mirror the param sharding (suffix rules match there too)
    mu = state.opt_state[0].mu["params"]
    assert _spec_of(mu["out_2"]["v"]) == P(None, "model")
    assert _spec_of(mu["gru_w_ih"]) == P("model", None)
    # scalars replicate
    assert _spec_of(state.step) == P()


def test_shard_state_forced_global_matches(data_dir, monkeypatch):
    """shard_state placement must survive multi-controller assembly: the
    forced make_array_from_callback path (what a pod process with tp>1
    executes — raw device_put would reject non-addressable devices,
    ADVICE round 3) yields bit-identical arrays and shardings."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=N_OBJ, max_qlen=10)
    model = build_model(MCFG, ds)
    tx = make_optimizer(TrainConfig(), 10)
    sample = next(iter(Batcher(ds, 16)))
    state = create_train_state(model, model.cfg, tx, sample, seed=0)
    mesh = make_mesh_2d(2)
    base = shard_state(state, mesh)
    monkeypatch.setenv("VQAX_FORCE_GLOBAL_ARRAYS", "1")
    forced = shard_state(state, mesh)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(base),
            jax.tree_util.tree_leaves_with_path(forced)):
        if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        # is_equivalent_to: key_data normalizes P() to P(None,) on one
        # path only — semantically identical placements
        assert b.sharding.is_equivalent_to(a.sharding, b.ndim), pa
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=str(pa))


def test_tp_training_matches_data_parallel(data_dir, tmp_path):
    """dp4 x tp2 training reaches the same parameters as 1-device
    training (same seed/data); TP only changes reduction order, so
    allclose rather than bit-identical."""
    def run(tp, num_devices):
        ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=N_OBJ,
                                  max_qlen=10)
        tcfg = TrainConfig(lr=5e-3, epochs=3, batch_size=32,
                           eval_interval=0, log_interval=1000,
                           num_devices=num_devices, tp=tp)
        model, state, acc = fit(tcfg, MCFG, ds)
        return jax.tree.leaves(state.params), acc

    ref, acc_ref = run(tp=1, num_devices=1)
    got, acc_tp = run(tp=2, num_devices=8)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert np.isfinite(acc_tp)


def test_tp_indivisible_dims_replicate(tmp_path):
    """Dims that don't divide tp (answer vocab 9, q vocab 21 over tp=2)
    fall back to replication per-leaf and training still runs — the
    real VQA answer dim (3001, prime) relies on exactly this."""
    d = str(tmp_path / "odd")
    generate_synthetic_vqa(d, n_images=16, n_questions=128, n_obj=N_OBJ,
                           feat_dim=FEAT, q_vocab=20, n_answers=8)
    ds = GraphVQADataset.vqa2(d, "train", n_obj=N_OBJ, max_qlen=10)
    model = build_model(MCFG, ds)
    tx = make_optimizer(TrainConfig(), 10)
    sample = next(iter(Batcher(ds, 16)))
    state = create_train_state(model, model.cfg, tx, sample, seed=0)
    mesh = make_mesh_2d(2, num_devices=4)
    sharded = shard_state(state, mesh)
    p = sharded.params["params"]
    assert _spec_of(p["out_2"]["v"]) == P()          # 9 % 2 != 0
    assert _spec_of(p["wembed"]) == P()              # 21 % 2 != 0
    assert _spec_of(p["gru_w_ih"]) == P("model", None)  # 96 % 2 == 0

    tcfg = TrainConfig(lr=5e-3, epochs=1, batch_size=16, eval_interval=0,
                       log_interval=1000, num_devices=4, tp=2)
    model, state, acc = fit(tcfg, MCFG, ds)
    assert np.isfinite(acc)


def test_vgb_rules_scoped_to_weight_norm_owners():
    """The single-letter v/g/b suffix rules fire only under the known
    weight-norm modules (edge_layer_*, out_*); a future parameter that
    merely ENDS in one of those names replicates instead of silently
    column-sharding (ADVICE round 2)."""
    from vqa_project_tpu.parallel.tp import param_spec

    mesh = make_mesh_2d(2)
    tree = {"params": {
        "mystery_module": {"v": np.zeros((8, 8)), "g": np.zeros((8,)),
                           "b": np.zeros((8,))},
        "out_1": {"v": np.zeros((8, 8)), "g": np.zeros((8,)),
                  "b": np.zeros((8,))},
        "edge_layer_2": {"v": np.zeros((8, 8))},
    }}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    specs = {tuple(str(k.key) for k in path): param_spec(path, leaf, mesh)
             for path, leaf in flat}
    assert specs[("params", "mystery_module", "v")] == P()
    assert specs[("params", "mystery_module", "g")] == P()
    assert specs[("params", "mystery_module", "b")] == P()
    assert specs[("params", "out_1", "v")] == P(None, "model")
    assert specs[("params", "out_1", "g")] == P("model")
    assert specs[("params", "out_1", "b")] == P("model")
    assert specs[("params", "edge_layer_2", "v")] == P(None, "model")
