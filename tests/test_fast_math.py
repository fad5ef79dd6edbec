"""--fast_math preset: all opt-in bf16 storage knobs together.

The reference has no such trade (single-GPU f32 Adam, run.py:172); this
covers the TPU build's bundled bandwidth preset: bf16 Adam mu + nu
storage AND the bf16 shard_map gradient all-reduce in ONE run, plus the
CLI resolution rules (explicit flag > --fast_math > float32).
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from vqa_project_tpu.cli.run import input_args, make_configs, \
    resolve_dtype_knobs
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
    d = tmp_path_factory.mktemp("synth_fm")
    generate_synthetic_vqa(
        str(d), n_images=16, n_questions=256, n_obj=8, feat_dim=24,
        q_vocab=20, n_answers=8)
    return str(d)


def test_resolve_default_is_exact():
    args, _, _ = input_args([])
    assert resolve_dtype_knobs(args) == ("float32", "float32", "float32")


def test_resolve_fast_math_flips_all_three():
    args, _, _ = input_args(["--fast_math"])
    assert resolve_dtype_knobs(args) == (
        "bfloat16", "bfloat16", "bfloat16")


def test_resolve_explicit_beats_preset():
    args, _, _ = input_args(
        ["--fast_math", "--adam_nu_dtype", "float32"])
    assert resolve_dtype_knobs(args) == (
        "bfloat16", "float32", "bfloat16")


def test_resolve_tp_gates_grad_reduce():
    """grad_reduce bf16 needs the 1-D data mesh (steps.py:363-372);
    the preset must not select it under --tp > 1."""
    args, _, _ = input_args(["--fast_math", "--tp", "2"])
    assert resolve_dtype_knobs(args) == (
        "bfloat16", "bfloat16", "float32")


def test_make_configs_threads_the_preset():
    args, _, _ = input_args(["--fast_math"])
    _, tcfg = make_configs(args)
    assert tcfg.adam_mu_dtype == "bfloat16"
    assert tcfg.adam_nu_dtype == "bfloat16"
    assert tcfg.grad_reduce_dtype == "bfloat16"


def test_grad_reduce_degrades_on_sharded_cache(data_dir, capsys):
    """--fast_math on a table too big for per-chip residency: the cache
    resolves to a ShardedFeatureCache inside fit(), which must DEGRADE
    grad_reduce to the f32 path (with a warning) instead of crashing in
    _build_bf16_reduce_step (ADVICE round 3 medium)."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    table = ds.store.features.size * 4 + ds.store.boxes.nbytes
    tcfg = TrainConfig(lr=5e-3, epochs=1, batch_size=32,
                       eval_interval=0, log_interval=1000,
                       device_cache_bytes=table // 4,  # forces sharding
                       adam_mu_dtype="bfloat16",
                       adam_nu_dtype="bfloat16",
                       grad_reduce_dtype="bfloat16")
    _, state, acc = fit(tcfg, MODEL_CFG, ds)
    assert jnp.isfinite(jnp.asarray(acc))
    out = capsys.readouterr().out
    assert "falling back to the exact float32" in out
    assert "sharding across" in out  # the cache really went sharded


def test_grad_reduce_degrades_on_tp_mesh(data_dir, capsys):
    """Explicit grad_reduce_dtype=bfloat16 with tp>1 (the preset gates
    this, a direct TrainConfig does not) degrades instead of raising."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=1, batch_size=32,
                       eval_interval=0, log_interval=1000,
                       tp=2, grad_reduce_dtype="bfloat16")
    _, _, acc = fit(tcfg, MODEL_CFG, ds)
    assert jnp.isfinite(jnp.asarray(acc))
    assert "model-parallel mesh" in capsys.readouterr().out


def test_all_knobs_on_still_learns(data_dir):
    """mu+nu bf16 storage AND the bf16 gradient psum together (the
    --fast_math configuration) still converge on the synthetic rule
    task (chance 12.5%), and the opt state really is bf16/bf16."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=20, batch_size=32,
                       eval_interval=0, log_interval=1000,
                       adam_mu_dtype="bfloat16",
                       adam_nu_dtype="bfloat16",
                       grad_reduce_dtype="bfloat16")
    _, state, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 60.0, acc
    adam_states = [
        s for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: isinstance(
                x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states
    for leaf in jax.tree.leaves(adam_states[0].mu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(adam_states[0].nu):
        assert leaf.dtype == jnp.bfloat16
