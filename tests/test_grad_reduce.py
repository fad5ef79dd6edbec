"""bf16 gradient all-reduce (TrainConfig.grad_reduce_dtype).

The reference is single-GPU (SURVEY.md "Parallelism") — this covers the
TPU build's explicit shard_map gradient-reduction path
(train/steps.py::_build_bf16_reduce_step): psum(grad.astype(bf16)) over
the data axis, halving the per-step ICI bytes vs the f32 all-reduce the
inferred-sharding path emits.
"""

import re

import jax
import numpy as np
import pytest

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.train.loop import fit

MODEL_CFG = ModelConfig(
    emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
    neighbourhood_size=4, dropout=0.0, max_qlen=10,
    compute_dtype="float32", use_pallas=False)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_gr")
    generate_synthetic_vqa(
        str(d), n_images=16, n_questions=256, n_obj=8, feat_dim=24,
        q_vocab=20, n_answers=8)
    return str(d)


def _fit_params(data_dir, grad_reduce_dtype, epochs=1, lr=1e-3):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=lr, epochs=epochs, batch_size=32,
                       eval_interval=0, log_interval=1000,
                       grad_reduce_dtype=grad_reduce_dtype)
    model, state, acc = fit(tcfg, MODEL_CFG, ds)
    return jax.device_get(state.params), acc


def test_bf16_reduce_close_to_f32_reduce(data_dir):
    """One epoch with the bf16 reduction tracks the f32 path closely:
    only the per-shard gradient contributions round to bf16 (and the
    dropout stream decorrelates — dropout is 0 here to isolate the
    rounding)."""
    p_f32, _ = _fit_params(data_dir, "float32")
    p_bf16, _ = _fit_params(data_dir, "bfloat16")
    for a, b in zip(jax.tree.leaves(p_f32), jax.tree.leaves(p_bf16)):
        a, b = np.asarray(a), np.asarray(b)
        # updates are lr-sized; after 8 steps the drift stays tiny
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-4)


def test_bf16_reduce_learns(data_dir):
    """Multi-epoch convergence on the synthetic rule task (chance 12.5%)."""
    _, acc = _fit_params(data_dir, "bfloat16", epochs=15, lr=5e-3)
    assert acc > 50.0, acc


def test_bf16_reduce_requests_bf16_allreduce(data_dir):
    """The lowered step carries the gradient all-reduces in bf16 —
    exactly half the f32 gradient bytes (the CPU backend then widens the
    accumulation; TPU executes the requested dtype)."""
    from vqa_project_tpu.data import Batcher
    from vqa_project_tpu.parallel import make_mesh, replicate, shard_batch
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.train.state import create_train_state, \
        make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    mesh = make_mesh(8)
    tcfg = TrainConfig(batch_size=32, grad_reduce_dtype="bfloat16")
    tx = make_optimizer(tcfg, 8)
    batch = next(iter(Batcher(ds, 32, materialize=True)))
    state = create_train_state(model, model.cfg, tx, batch, seed=0)
    state = replicate(state, mesh)
    step = build_train_step(model, tx, mesh, n_answers=ds.n_answers,
                            grad_reduce_dtype="bfloat16")
    sharded = shard_batch(batch, mesh)
    txt = step.jit_step.lower(state, sharded, ()).as_text()

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from scaling_report import collect_stablehlo

    requested = collect_stablehlo(txt)
    assert "bf16" in requested, requested
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    assert requested["bf16"]["bytes"] == 2 * n_params, (requested, n_params)
    # nothing param-sized left in f32 (just the loss/score/valid scalars)
    assert requested.get("f32", {"bytes": 0})["bytes"] < 64


def test_bf16_reduce_rejects_tp_mesh(data_dir):
    from vqa_project_tpu.data import Batcher
    from vqa_project_tpu.parallel import make_mesh_2d
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.train.state import make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    mesh = make_mesh_2d(2, 8)
    tx = make_optimizer(TrainConfig(batch_size=32), 8)
    with pytest.raises(ValueError, match="1-D data mesh"):
        build_train_step(model, tx, mesh, grad_reduce_dtype="bfloat16")


def test_unknown_grad_reduce_dtype_rejected(data_dir):
    from vqa_project_tpu.parallel import make_mesh
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.train.state import make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    tx = make_optimizer(TrainConfig(batch_size=32), 8)
    with pytest.raises(ValueError, match="float32|bfloat16"):
        build_train_step(model, tx, make_mesh(8),
                         grad_reduce_dtype="fp8")
