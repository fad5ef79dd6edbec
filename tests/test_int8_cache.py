"""int8 row-quantized device feature cache (feature_cache_dtype="int8").

The reference keeps the zarr feature table f32 on disk and streams it
per batch (torch_dataset.py:148-154); the TPU build's device cache is
pure HBM residency, and the int8 mode exists so the real 123k-image
table (18.4 GB bf16) fits ONE chip (9.2 GB int8). These tests cover the
quantizer's error bound, the gather+dequant image_fn against the exact
f32 path, end-to-end convergence, and the sharded-step integration on
the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.ops.quant import quantize_feature_table
from vqa_project_tpu.parallel import make_mesh
from vqa_project_tpu.train.loop import fit, make_feature_cache
from vqa_project_tpu.train.steps import (QuantizedFeatureCache,
                                         make_image_fn)

MODEL_CFG = ModelConfig(
    emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
    neighbourhood_size=4, dropout=0.0, max_qlen=10,
    compute_dtype="float32", use_pallas=False)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_q8")
    generate_synthetic_vqa(
        str(d), n_images=16, n_questions=256, n_obj=8, feat_dim=24,
        q_vocab=20, n_answers=8)
    return str(d)


def test_quantizer_error_bound():
    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((6, 5, 16)) * 10).astype(np.float32)
    feats[2, 3] = 0.0  # padding box row
    q, scale = quantize_feature_table(feats)
    assert q.dtype == np.int8 and scale.shape == (6, 5)
    recon = q.astype(np.float32) * scale[..., None]
    # symmetric round-to-nearest: error <= scale/2 per element
    assert (np.abs(recon - feats) <= scale[..., None] / 2 + 1e-7).all()
    assert (recon[2, 3] == 0).all()  # zero rows stay exact zeros


def test_make_feature_cache_int8(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    mesh = make_mesh(1)
    tcfg = TrainConfig(feature_cache_dtype="int8")
    cache = make_feature_cache(ds, mesh, tcfg, "float32")
    assert isinstance(cache, QuantizedFeatureCache)
    assert np.asarray(cache.features).dtype == np.int8
    assert cache.out_dtype == "float32"


def test_image_fn_dequant_close_to_f32(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    mesh = make_mesh(1)
    q_cache = make_feature_cache(
        ds, mesh, TrainConfig(feature_cache_dtype="int8"), "float32")
    f_cache = make_feature_cache(
        ds, mesh, TrainConfig(feature_cache_dtype="float32"), "float32")
    q_fn, q_arrays = make_image_fn(q_cache, mesh=mesh)
    f_fn, f_arrays = make_image_fn(f_cache, mesh=mesh)
    rows = jnp.asarray([0, 3, 3, 15], jnp.int32)
    qi, qb = q_fn(q_arrays, rows)
    fi, fb = f_fn(f_arrays, rows)
    assert qi.dtype == fi.dtype
    # per-element error bounded by scale/2 = absmax/254 per box row
    absmax = np.abs(np.asarray(fi)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(qi) - np.asarray(fi))
            <= absmax / 254 + 1e-7).all()
    np.testing.assert_array_equal(np.asarray(qb), np.asarray(fb))


def test_int8_cache_still_learns(data_dir):
    """End-to-end fit over the 8-device mesh with the int8 cache: the
    synthetic rule task (chance 12.5%) still converges — ~0.4% input
    noise is far below the task's margin."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    tcfg = TrainConfig(lr=5e-3, epochs=20, batch_size=32,
                       eval_interval=0, log_interval=1000,
                       feature_cache_dtype="int8")
    _, _, acc = fit(tcfg, MODEL_CFG, ds)
    assert acc > 60.0, acc


def test_int8_falls_back_when_over_budget(data_dir):
    """A tiny device_cache_bytes forces the int8 block to decline and
    the normal mode selection to continue (here: host mode, None)."""
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    mesh = make_mesh(1)
    tcfg = TrainConfig(feature_cache_dtype="int8", device_cache_bytes=64)
    cache = make_feature_cache(ds, mesh, tcfg, "float32")
    assert not isinstance(cache, QuantizedFeatureCache)
