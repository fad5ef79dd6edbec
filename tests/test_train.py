"""End-to-end harness tests on the virtual 8-device CPU mesh."""

import json
import os

import jax
import numpy as np
import pytest

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import Batcher, GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.train.loop import build_model, evaluate, fit
from vqa_project_tpu.train.state import (
    create_train_state,
    load_checkpoint,
    make_lr_schedule,
    make_optimizer,
    save_checkpoint,
)

MODEL_CFG = ModelConfig(
    emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
    neighbourhood_size=4, dropout=0.1, max_qlen=10,
    compute_dtype="float32", use_pallas=False)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_train")
    generate_synthetic_vqa(
        str(d), n_images=16, n_questions=256, n_obj=8, feat_dim=24,
        q_vocab=20, n_answers=8, with_test=True)
    return str(d)


def test_eight_device_mesh_available():
    assert jax.device_count() == 8


def test_lr_schedule_multistep():
    cfg = TrainConfig(lr=1e-3, lr_milestones=(2,), lr_gamma=0.5)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(5e-4)


def test_fit_learns_synthetic_task(data_dir, tmp_path):
    train_ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=25, batch_size=32, eval_interval=0,
                       save_dir=str(tmp_path), log_interval=1000)
    model, state, acc = fit(tcfg, MODEL_CFG, train_ds)
    # synthetic task is deterministic; well above the 12.5% chance level
    assert acc > 60.0, acc

    # eval on val split exercises the full eval path + result.json
    val_ds = GraphVQADataset.vqa2(data_dir, "val", n_obj=8, max_qlen=10)
    rpath = str(tmp_path / "result.json")
    acc_val, result, adjacencies = evaluate(model, state.params, val_ds, 32,
                                            result_path=rpath)
    assert adjacencies is None
    assert os.path.exists(rpath)
    loaded = json.load(open(rpath))
    assert len(loaded) == val_ds.n_questions
    assert set(loaded[0]) == {"question_id", "answer"}
    assert acc_val > 30.0, acc_val


@pytest.mark.parametrize("resident", ["1", "0"])
def test_mini_validation_both_paths(data_dir, tmp_path, capsys,
                                    monkeypatch, resident):
    """fit() with eval_interval triggers the mid-epoch mini-validation in
    both its resident (one-dispatch) and streaming forms; both print a
    finite validation accuracy and save the mid-epoch checkpoint."""
    monkeypatch.setenv("VQAX_RESIDENT_EVAL", resident)
    train_ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    val_ds = GraphVQADataset.vqa2(data_dir, "val", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=32, eval_interval=4,
                       save_dir=str(tmp_path), log_interval=1000,
                       name="mv")
    fit(tcfg, MODEL_CFG, train_ds, val_ds)
    outs = [ln for ln in capsys.readouterr().out.splitlines()
            if "Validation accuracy" in ln]
    assert outs, "mini-validation never ran"
    acc = float(outs[0].split(":")[1].strip().rstrip(" %"))
    assert 0.0 <= acc <= 100.0
    assert any(f.startswith("mv_") for f in os.listdir(tmp_path))


def test_resident_eval_matches_streaming(data_dir, tmp_path, monkeypatch):
    """The one-dispatch lax.scan eval epoch (device-resident batches)
    must produce the same accuracy and the same result.json rows as the
    classic per-step streaming loop, including the mask-padded final
    batch (n_questions=64 is not a multiple of bsize 24)."""
    ds = GraphVQADataset.vqa2(data_dir, "val", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=24)
    tx = make_optimizer(tcfg, 10)
    sample = next(iter(Batcher(ds, 24)))
    params = create_train_state(model, model.cfg, tx, sample, seed=4).params

    out = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("VQAX_RESIDENT_EVAL", knob)
        rpath = str(tmp_path / f"res_{knob}.json")
        acc, result, _ = evaluate(model, params, ds, 24, result_path=rpath)
        out[knob] = (acc, result)
        assert len(result) == ds.n_questions
    assert out["1"][0] == pytest.approx(out["0"][0], abs=1e-4)
    assert out["1"][1] == out["0"][1]


def test_checkpoint_roundtrip(data_dir, tmp_path):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=16)
    model = build_model(MODEL_CFG, ds)
    tx = make_optimizer(tcfg, 10)
    sample = next(iter(Batcher(ds, 16)))
    state = create_train_state(model, model.cfg, tx, sample, seed=1)

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state, epoch=3, extra={"note": "hi"})
    payload, restored = load_checkpoint(path, state)
    assert payload["epoch"] == 3
    assert payload["extra"]["note"] == "hi"

    def trees_equal(a, b):
        la = jax.tree.leaves(a)
        lb = jax.tree.leaves(b)
        return all(np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(la, lb))

    assert trees_equal(state.params, restored.params)
    assert trees_equal(state.opt_state, restored.opt_state)


def test_resume_continues_epoch(data_dir, tmp_path):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=32, eval_interval=0,
                       save_dir=str(tmp_path), name="m", log_interval=1000)
    model, state, _ = fit(tcfg, MODEL_CFG, ds, save_every_epoch=True)
    ckpt = str(tmp_path / "m_1.ckpt")
    assert os.path.exists(ckpt)
    # resume: epoch counter picks up from the checkpoint
    model2, state2, _ = fit(tcfg, MODEL_CFG, ds, resume_path=ckpt,
                            save_every_epoch=True)
    assert os.path.exists(str(tmp_path / "m_2.ckpt"))
    assert int(state2.step) > int(state.step)


def test_synthetic_binary_encoding_learns(tmp_path):
    """The binary class encoding (full-width convergence task): class
    count decoupled from the answer vocab, class id written as +/-2 bit
    channels. A wide-head model must still learn it well above chance
    (chance = 1/16 over the 16 used answers here)."""
    d = str(tmp_path / "bin")
    generate_synthetic_vqa(d, n_images=16, n_questions=256, n_obj=8,
                           feat_dim=24, q_vocab=20, n_answers=64,
                           n_classes=8, class_encoding="binary")
    ds = GraphVQADataset.vqa2(d, "train", n_obj=8, max_qlen=10)
    assert ds.n_answers == 65  # head width = answer vocab + pad slot
    tcfg = TrainConfig(lr=5e-3, epochs=25, batch_size=32,
                       eval_interval=0, log_interval=1000)
    _, _, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 40.0, acc


def test_resume_bit_identical_to_uninterrupted(data_dir, tmp_path):
    """fit(2 epochs) == fit(1 epoch) -> checkpoint -> resumed fit(1
    epoch), BIT-identically: the per-epoch deterministic shuffle
    (data/loader.py) plus the checkpointed step/rng/Adam state make the
    resumed epoch see exactly the batches, dropout draws and LR values
    of the uninterrupted run (reference resume contract run.py:176-181,
    strengthened to bit-exactness)."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)

    def tcfg(epochs, sub):
        return TrainConfig(lr=1e-3, epochs=epochs, batch_size=32,
                           eval_interval=0, log_interval=1000,
                           save_dir=str(tmp_path / sub), name="m")

    _, full, _ = fit(tcfg(2, "full"), MODEL_CFG, ds)
    fit(tcfg(1, "part"), MODEL_CFG, ds, save_every_epoch=True)
    _, resumed, _ = fit(tcfg(1, "part"), MODEL_CFG, ds,
                        resume_path=str(tmp_path / "part" / "m_1.ckpt"))
    assert int(resumed.step) == int(full.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(full.params), jax.device_get(resumed.params))


def test_midepoch_resume_bit_identical(data_dir, tmp_path):
    """Preemption at an eval_interval boundary (the reference writes a
    full-state checkpoint there, run.py:239-244): the checkpoint records
    its position WITHIN the epoch, and the resumed fit first finishes
    the interrupted epoch's remaining batches — same shuffle stream,
    same dropout draws — before moving on. Final params must be
    bit-identical to a never-interrupted run."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    # locality-partitioned loader -> 6 steps per epoch at bs 32 here

    def tcfg(epochs, sub, eval_interval=0):
        return TrainConfig(lr=1e-3, epochs=epochs, batch_size=32,
                           eval_interval=eval_interval, log_interval=1000,
                           save_dir=str(tmp_path / sub), name="m")

    _, full, _ = fit(tcfg(2, "full"), MODEL_CFG, ds)
    steps_per_epoch = int(full.step) // 2

    # eval_interval=4 -> ONE mid-epoch save at step 4 of epoch 0; the
    # surviving m_1.ckpt leaves 2 batches of epoch 0 untrained = the
    # "preempted at step 4" scenario
    fit(tcfg(1, "part", eval_interval=4), MODEL_CFG, ds, val_ds=ds)
    ckpt = str(tmp_path / "part" / "m_1.ckpt")
    payload, _ = load_checkpoint(ckpt)
    assert payload["epoch"] == 1
    assert 0 < payload["extra"]["step_in_epoch"] < steps_per_epoch
    assert payload["extra"]["step_in_epoch"] == 4

    _, resumed, _ = fit(tcfg(2, "part2"), MODEL_CFG, ds, resume_path=ckpt)
    assert int(resumed.step) == int(full.step)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(full.params), jax.device_get(resumed.params))


def test_train_matches_single_device(data_dir):
    """Data-parallel (8 devices) and single-device runs produce identical
    parameters: the mesh changes layout, not math."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    results = []
    for ndev in (1, 8):
        tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=32,
                           eval_interval=0, num_devices=ndev,
                           log_interval=1000)
        model, state, acc = fit(tcfg, MODEL_CFG, ds)
        results.append(jax.device_get(state.params))
    leaves1 = jax.tree.leaves(results[0])
    leaves8 = jax.tree.leaves(results[1])
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_step_timer_and_force_sync():
    import jax.numpy as jnp

    from vqa_project_tpu.train.profiling import StepTimer, force_sync

    t = StepTimer(warmup=1, batch_size=8, n_chips=2)
    for _ in range(4):
        with t:
            force_sync(jnp.ones((4,)))
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] > 0
    assert s["qa_pairs_per_sec_per_chip"] > 0


def test_async_checkpoint(data_dir, tmp_path):
    from vqa_project_tpu.train.state import (
        async_save_checkpoint,
        wait_for_async_saves,
    )

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    tx = make_optimizer(TrainConfig(), 10)
    sample = next(iter(Batcher(ds, 8)))
    state = create_train_state(model, model.cfg, tx, sample, seed=1)

    path = str(tmp_path / "async.ckpt")
    async_save_checkpoint(path, state, epoch=2)
    wait_for_async_saves()
    payload, restored = load_checkpoint(path, state)
    assert payload["epoch"] == 2
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_learns_with_bf16_compute(data_dir):
    """The production numerics policy (bf16 matmuls) still learns."""
    import dataclasses

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    cfg = dataclasses.replace(MODEL_CFG, compute_dtype="bfloat16")
    tcfg = TrainConfig(lr=5e-3, epochs=15, batch_size=32, eval_interval=0,
                       log_interval=1000)
    model, state, acc = fit(tcfg, cfg, ds)
    assert acc > 40.0, acc


def test_training_is_deterministic(data_dir):
    """Fixed seed -> bit-identical parameters (the reference pins
    torch/CUDA seeds at 1000, run.py:123-127; SURVEY §4 determinism)."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    results = []
    for _ in range(2):
        tcfg = TrainConfig(lr=1e-3, epochs=2, batch_size=32, seed=1000,
                           eval_interval=0, log_interval=1000)
        _, state, _ = fit(tcfg, MODEL_CFG, ds)
        results.append(jax.device_get(state.params))
    for a, b in zip(jax.tree.leaves(results[0]),
                    jax.tree.leaves(results[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_emb_grad_layout_pin_is_exact(data_dir, monkeypatch):
    """VQAX_EMB_GRAD_COLMAJOR=1 (in-step layout constraint on the wembed
    gradient) is a physical-layout change only: training must produce
    bit-identical parameters."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    results = []
    for knob in ("0", "1"):
        monkeypatch.setenv("VQAX_EMB_GRAD_COLMAJOR", knob)
        tcfg = TrainConfig(lr=1e-3, epochs=2, batch_size=32, seed=1000,
                           eval_interval=0, log_interval=1000)
        _, state, _ = fit(tcfg, MODEL_CFG, ds)
        results.append(jax.device_get(state.params))
    for a, b in zip(jax.tree.leaves(results[0]),
                    jax.tree.leaves(results[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_adam_mu_still_learns(data_dir):
    """adam_mu_dtype=bfloat16 (half the first-moment HBM traffic) must
    not break training: the synthetic task still converges, and the
    optimizer state actually stores mu in bf16."""
    import jax.numpy as jnp
    import optax

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=25, batch_size=32, eval_interval=0,
                       log_interval=1000, adam_mu_dtype="bfloat16")
    _, state, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 60.0, acc
    mu_leaves = [
        s.mu for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: isinstance(
                x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert mu_leaves
    for leaf in jax.tree.leaves(mu_leaves[0]):
        assert leaf.dtype == jnp.bfloat16


def test_bf16_adam_nu_still_learns(data_dir):
    """adam_nu_dtype=bfloat16 (half the second-moment HBM traffic) must
    not break training: the synthetic task still converges and the
    optimizer state actually stores nu in bf16 (mu stays f32)."""
    import jax.numpy as jnp
    import optax

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=25, batch_size=32, eval_interval=0,
                       log_interval=1000, adam_nu_dtype="bfloat16")
    _, state, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 60.0, acc
    adam_states = [
        s for s in jax.tree.leaves(
            state.opt_state, is_leaf=lambda x: isinstance(
                x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states
    for leaf in jax.tree.leaves(adam_states[0].nu):
        assert leaf.dtype == jnp.bfloat16
    for leaf in jax.tree.leaves(adam_states[0].mu):
        assert leaf.dtype == jnp.float32


def test_bf16_adam_nu_first_update_exact(data_dir):
    """The nu_dtype wrapper changes STORAGE only: from a fresh init
    (nu = 0, exact in bf16) one update must be bit-identical to plain
    f32 optax.adam — the f32 update math sees the same upcast nu."""
    import jax.numpy as jnp
    import optax

    grads = {"w": jnp.asarray([[0.25, -3.0e-4], [1.5, 0.0]], jnp.float32),
             "b": jnp.asarray([1.0e-3, -7.0], jnp.float32)}
    params = jax.tree.map(jnp.zeros_like, grads)
    ref = optax.adam(1e-3)
    wrapped = make_optimizer(
        TrainConfig(lr=1e-3, lr_milestones=(), adam_nu_dtype="bfloat16"),
        steps_per_epoch=10)
    ref_up, _ = ref.update(grads, ref.init(params), params)
    got_up, new_state = wrapped.update(grads, wrapped.init(params), params)
    for a, b in zip(jax.tree.leaves(ref_up), jax.tree.leaves(got_up)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    nus = [s.nu for s in jax.tree.leaves(
               new_state, is_leaf=lambda x: isinstance(
                   x, optax.ScaleByAdamState))
           if isinstance(s, optax.ScaleByAdamState)]
    assert {l.dtype for l in jax.tree.leaves(nus)} == {
        jnp.dtype(jnp.bfloat16)}


def test_bf16_feature_cache_still_learns(data_dir):
    """Storing the device feature table in bfloat16 (half HBM) must not
    break training."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=15, batch_size=32, eval_interval=0,
                       log_interval=1000, feature_cache_dtype="bfloat16")
    model, state, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 40.0, acc


def test_scaling_report_parser():
    """tools/scaling_report.py's HLO collective parser: counts and bytes
    from representative optimized-HLO lines, including tuple shapes and
    async -start forms."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import scaling_report as sr

    hlo = "\n".join([
        "  %ar = f32[13001,300]{1,0} all-reduce(f32[13001,300]{1,0} %g),"
        " replica_groups={}",
        "  %ar2 = (f32[1024]{0}, f32[3001]{0}) all-reduce("
        "f32[1024]{0} %a, f32[3001]{0} %b)",
        "  %ag = bf16[2048,1024]{1,0} all-gather(bf16[1024,1024]{1,0} %x),"
        " dimensions={0}",
        "  %cp = f32[128,128]{1,0} collective-permute-start("
        "f32[128,128]{1,0} %y)",
        "  %plain = f32[64]{0} add(f32[64]{0} %p, f32[64]{0} %q)",
    ])
    stats = sr.collect(hlo)
    assert stats["all-reduce"]["count"] == 2
    assert stats["all-reduce"]["bytes"] == (
        13001 * 300 * 4 + 1024 * 4 + 3001 * 4)
    assert stats["all-gather"]["bytes"] == 2048 * 1024 * 2
    assert stats["collective-permute"]["count"] == 1
    assert "add" not in str(stats)


def test_checkpoint_resumes_across_mu_dtype_change(data_dir, tmp_path):
    """A checkpoint written with f32 Adam moments resumes into a
    bf16-mu configuration in the CONFIGURED dtype (template-driven
    restore), and vice versa."""
    import jax.numpy as jnp
    import optax

    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model = build_model(MODEL_CFG, ds)
    sample = next(iter(Batcher(ds, 16)))

    def mk_state(mu_dtype):
        tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=16,
                           adam_mu_dtype=mu_dtype)
        tx = make_optimizer(tcfg, 10)
        return create_train_state(model, model.cfg, tx, sample, seed=1)

    def mu_dtypes(state):
        return {leaf.dtype
                for s in jax.tree.leaves(
                    state.opt_state, is_leaf=lambda x: isinstance(
                        x, optax.ScaleByAdamState))
                if isinstance(s, optax.ScaleByAdamState)
                for leaf in jax.tree.leaves(s.mu)}

    path = str(tmp_path / "f32.ckpt")
    save_checkpoint(path, mk_state("float32"), epoch=1)
    _, restored = load_checkpoint(path, mk_state("bfloat16"))
    assert mu_dtypes(restored) == {jnp.dtype(jnp.bfloat16)}

    path2 = str(tmp_path / "bf16.ckpt")
    save_checkpoint(path2, mk_state("bfloat16"), epoch=1)
    _, restored2 = load_checkpoint(path2, mk_state("float32"))
    assert mu_dtypes(restored2) == {jnp.dtype(jnp.float32)}
