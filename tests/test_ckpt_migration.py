"""Legacy checkpoint migration: (n, in, d) conv_kernels -> fused (in, nd).

Checkpoints written before the round-3 plain-GEMM projection layout
stored the per-kernel projections stacked; load_checkpoint migrates
them (and the Adam moments, which mirror the param tree) in place and
bit-for-bit (train/state.py::_migrate_conv_kernels)."""

import flax.serialization
import jax
import numpy as np

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import Batcher
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.data.datasets import GraphVQADataset
from vqa_project_tpu.train.loop import build_model
from vqa_project_tpu.train.state import (
    create_train_state,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
)


def _legacy(tree, n_kernels):
    """Recursively rewrite fused conv_kernels into the legacy stack."""
    if not isinstance(tree, dict):
        return
    for key, val in tree.items():
        if key == "conv_kernels" and hasattr(val, "ndim") and val.ndim == 2:
            in_dim, nd = val.shape
            tree[key] = (np.asarray(val)
                         .reshape(in_dim, n_kernels, nd // n_kernels)
                         .transpose(1, 0, 2))
        else:
            _legacy(val, n_kernels)


def test_legacy_conv_kernels_checkpoint_loads_bit_exact(tmp_path):
    data_dir = str(tmp_path / "d")
    generate_synthetic_vqa(data_dir, n_images=8, n_questions=32, n_obj=9,
                           feat_dim=64, q_vocab=40, n_answers=12, seed=3)
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=9, max_qlen=16)
    mcfg = ModelConfig(hid_dim=32, n_kernels=4, neighbourhood_size=4,
                       compute_dtype="float32", use_pallas=False)
    model = build_model(mcfg, ds)
    tx = make_optimizer(TrainConfig(batch_size=8), 10)
    sample = next(iter(Batcher(ds, 8)))
    state = create_train_state(model, mcfg, tx, sample, seed=0)

    path = str(tmp_path / "new.ckpt")
    save_checkpoint(path, state, epoch=2)

    # rewrite the saved payload into the pre-round-3 legacy layout
    payload = flax.serialization.msgpack_restore(open(path, "rb").read())
    _legacy(payload, mcfg.n_kernels)
    legacy_path = str(tmp_path / "legacy.ckpt")
    shapes = [v["conv_kernels"].shape
              for k, v in payload["params"]["params"].items()
              if isinstance(v, dict) and "conv_kernels" in v]
    assert all(len(s) == 3 for s in shapes), shapes  # really legacy now
    with open(legacy_path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))

    for p in (path, legacy_path):
        loaded_payload, loaded = load_checkpoint(p, state)
        assert loaded_payload["epoch"] == 2
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, loaded.params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.opt_state, loaded.opt_state)
