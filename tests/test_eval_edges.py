"""Operator-facing eval/serve/data edges (round-4 review fixes).

Each test pins a failure an operator could actually hit: an untrained
checkpoint whose argmax lands on the answer-vocab pad slot, eval-CLI
cache knobs silently dropped, a typo'd resume path training from
scratch, a regenerated zarr store reusing a stale packed cache, and
medical --synthetic ignoring knob changes.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.train.loop import build_model, evaluate, fit

N_OBJ, FEAT = 8, 24
MCFG = ModelConfig(emb_dim=16, hid_dim=24, combined_dim=16, n_kernels=3,
                   neighbourhood_size=4, dropout=0.1, max_qlen=10,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_edges")
    generate_synthetic_vqa(str(d), n_images=12, n_questions=64,
                           n_obj=N_OBJ, feat_dim=FEAT, q_vocab=20,
                           n_answers=8)
    return str(d)


def _ds(data_dir, split="val"):
    return GraphVQADataset.vqa2(data_dir, split, n_obj=N_OBJ,
                                max_qlen=10)


def _init_params(model, ds):
    return model.init(
        jax.random.key(0),
        jnp.zeros((2, ds.max_qlen), jnp.int32),
        jnp.zeros((2, ds.n_obj, ds.feat_dim), jnp.float32),
        jnp.ones((2,), jnp.int32))


def _pad_seeking_params(model, ds):
    """Params whose classifier bias makes EVERY argmax land on the
    answer-vocab pad slot (the last column, which has no a_itow word)."""
    params = _init_params(model, ds)
    bias = params["params"]["out_2"]["b"]
    params = jax.tree_util.tree_map(lambda x: x, params)  # deep copy
    params["params"]["out_2"]["b"] = bias.at[-1].set(1e6)
    return params


@pytest.mark.parametrize("resident", ["1", "0"])
def test_eval_masks_pad_answer_slot(data_dir, monkeypatch, resident):
    """evaluate() must never emit (or crash on) the wordless pad slot:
    ds.a_itow has no key n_answers-1, so an untrained/imported
    checkpoint whose logits peak there used to KeyError mid-sweep.
    Covers both the resident whole-epoch path and the streaming loop."""
    monkeypatch.setenv("VQAX_RESIDENT_EVAL", resident)
    ds = _ds(data_dir)
    model = build_model(MCFG, ds)
    params = _pad_seeking_params(model, ds)
    acc, result, _ = evaluate(model, params, ds, 8, result_path=None)
    assert len(result) == ds.n_questions
    valid = set(ds.a_itow.values())
    assert all(r["answer"] in valid for r in result)


def test_viz_masks_pad_answer_slot(data_dir):
    from vqa_project_tpu.viz.plots import find_question

    ds = _ds(data_dir)
    model = build_model(MCFG, ds)
    params = _pad_seeking_params(model, ds)
    row = ds.vqa[0]
    idx = find_question(ds.vqa, row["question"], row["image_id"])
    t = ds.table
    logits, _, _ = model.apply(
        params, jnp.asarray(t.tokens[idx:idx + 1]),
        jnp.asarray(ds.store.batch(t.image_row[idx:idx + 1])),
        jnp.asarray(t.qlen[idx:idx + 1]))
    # the viz lookup excludes the pad column the same way
    assert int(jnp.argmax(logits[0][:-1])) in ds.a_itow


def test_evaluate_honors_train_cfg(data_dir, monkeypatch):
    """--eval must thread the CLI's TrainConfig into the cache build:
    --feature_cache_dtype int8 exists precisely so the full table fits
    one chip at eval time; silently rebuilding a default TrainConfig
    dropped it."""
    from vqa_project_tpu.train import loop as L

    ds = _ds(data_dir)
    model = build_model(MCFG, ds)
    params = _init_params(model, ds)
    seen = {}
    real = L.make_feature_cache

    def spy(ds_, mesh, tcfg, cdt):
        seen["dtype"] = tcfg.feature_cache_dtype
        return real(ds_, mesh, tcfg, cdt)

    monkeypatch.setattr(L, "make_feature_cache", spy)
    tcfg = TrainConfig(batch_size=8, feature_cache_dtype="int8")
    acc, result, _ = L.evaluate(model, params, ds, 8, result_path=None,
                                train_cfg=tcfg)
    assert seen["dtype"] == "int8"
    assert len(result) == ds.n_questions


def test_evaluate_rejects_indivisible_batch(data_dir):
    ds = _ds(data_dir)
    model = build_model(MCFG, ds)
    params = _init_params(model, ds)
    with pytest.raises(ValueError, match="divisible"):
        evaluate(model, params, ds, jax.device_count() + 1,
                 result_path=None)


def test_fit_rejects_missing_resume_path(data_dir, tmp_path):
    """A typo'd resume path must not silently train from scratch and
    overwrite the checkpoint lineage it was meant to continue."""
    ds = _ds(data_dir, "train")
    tcfg = TrainConfig(batch_size=8, epochs=1, save_dir=str(tmp_path))
    with pytest.raises(FileNotFoundError, match="resume"):
        fit(tcfg, MCFG, ds, resume_path=str(tmp_path / "nope.ckpt"))


def test_serve_cli_synthetic(tmp_path):
    """`cli.serve --synthetic` (the documented smoke mode) must parse
    the synthetic knob flags _dataset reads — it used to crash with
    AttributeError before starting."""
    from vqa_project_tpu.cli import serve as serve_cli

    args = serve_cli.input_args([
        "--synthetic", "--data_dir", str(tmp_path),
        "--emb", "16", "--hid", "24", "--n_kernels", "3",
        "--neighbourhood_size", "4", "--n_obj", "8",
        "--compute_dtype", "float32", "--bsize", "4",
    ])
    srv = serve_cli.build_server(args)
    try:
        out = srv.predict("is there a thing", image_id="100")
        assert isinstance(out["answer"], str)
    finally:
        srv.close()


def test_packed_cache_invalidated_on_rewrite(tmp_path):
    """FeatureStore.from_zarr must not reuse a packed memmap built from
    an older store at the same path (ZarrWriter truncate-overwrites
    chunk files, which never touches the dir mtime)."""
    import time

    from vqa_project_tpu.data.datasets import FeatureStore
    from vqa_project_tpu.data.zarr_store import ZarrWriter

    d = str(tmp_path)
    fz, bz = os.path.join(d, "f.zarr"), os.path.join(d, "b.zarr")
    csv = os.path.join(d, "sizes.csv")
    with open(csv, "w") as f:  # transposed layout, see _read_sizes_csv
        f.write(",img0\n0,100\n1,100\n")

    def write(val):
        fw, bw = ZarrWriter(fz), ZarrWriter(bz)
        fw.create_dataset("img0", np.full((4, 6), val, np.float32))
        bw.create_dataset("img0", np.tile(
            np.array([1, 1, 9, 9], np.float32), (4, 1)))

    write(1.0)
    s1 = FeatureStore.from_zarr(fz, bz, csv, n_obj=4)
    assert float(s1.features[0, 0, 0]) == 1.0
    # same path, new contents; mtime resolution can be coarse on some
    # filesystems, so give the clock a beat
    time.sleep(0.02)
    write(2.0)
    s2 = FeatureStore.from_zarr(fz, bz, csv, n_obj=4)
    assert float(s2.features[0, 0, 0]) == 2.0
    # superseded pack files were cleaned up (only one _feat.npy left)
    cache = os.path.join(d, "_tpu_cache")
    feats = [p for p in os.listdir(cache) if p.endswith("_feat.npy")]
    assert len(feats) == 1


def test_medical_synthetic_refingerprint(tmp_path):
    """Changing --n_obj must regenerate the medical synthetic store
    (the knobs ARE the dataset), mirroring cli/run.py's fingerprint."""
    from vqa_project_tpu.cli.medical import _load_datasets

    def args(n_obj):
        return argparse.Namespace(synthetic=True, data_dir=str(tmp_path),
                                  emb=8, n_obj=n_obj)

    tr, _ = _load_datasets(args(9), "imageclef")
    assert tr.n_obj == 9
    tr2, _ = _load_datasets(args(7), "imageclef")
    assert tr2.n_obj == 7
    # unchanged knobs -> cache hit, same store
    tr3, _ = _load_datasets(args(7), "imageclef")
    assert tr3.n_obj == 7
