"""Medical-variant tests: adapters + grid-search harness artifacts."""

import os

import numpy as np
import pytest

from vqa_project_tpu.cli.medical import medical_input_args, grid_search_main
from vqa_project_tpu.data import Batcher, GraphVQADataset
from vqa_project_tpu.data.synthetic_medical import (
    generate_synthetic_imageclef,
    generate_synthetic_mimic,
)

N_OBJ = 9


@pytest.fixture(scope="module")
def clef_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clef")
    generate_synthetic_imageclef(str(d), n_images=6, n_questions=32,
                                 n_obj=N_OBJ, feat_dim=16, q_vocab=12,
                                 n_answers=6)
    return str(d)


@pytest.fixture(scope="module")
def mimic_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mimic")
    generate_synthetic_mimic(str(d), n_images=6, n_questions=32,
                             n_obj=N_OBJ, feat_dim=16, q_vocab=12,
                             n_answers=6)
    return str(d)


def test_imageclef_adapter(clef_dir):
    ds = GraphVQADataset.imageclef(clef_dir, n_obj=N_OBJ)
    assert ds.n_obj == N_OBJ
    assert ds.n_questions == 32
    assert ds.feat_dim == 16 + 4
    batch = next(iter(Batcher(ds, 8)))
    assert batch["image"].shape == (8, N_OBJ, 20)
    # dict-valued 'answers' parsed into votes
    a, v = ds.table.dense_answers(np.arange(4))
    assert (v.max(axis=1) == 10).all()


def test_mimic_adapter_split_vocab(mimic_dir):
    tr = GraphVQADataset.mimic(mimic_dir, "train", n_obj=N_OBJ)
    va = GraphVQADataset.mimic(mimic_dir, "val", n_obj=N_OBJ)
    assert tr.n_questions == va.n_questions == 32
    # split-specific feature stores
    assert tr.store is not va.store
    assert not np.array_equal(np.asarray(tr.store.features[0]),
                              np.asarray(va.store.features[0]))


def test_grid_search_harness(clef_dir, tmp_path, monkeypatch):
    """One-cell grid search end-to-end: txt log, checkpoint, CSV."""
    monkeypatch.chdir(tmp_path)
    args, parser, unparsed = medical_input_args([
        "--synthetic", "--data_dir", clef_dir,
        "--save_dir", str(tmp_path / "save"),
        "--plot_dir", str(tmp_path / "figures"),
        "--ep", "2", "--bsize", "8", "--hid", "24", "--emb", "16",
        "--n_obj", str(N_OBJ), "--compute_dtype", "float32",
        "--neighbors_list", "4", "--kernels_list", "3",
    ])
    # --synthetic regenerates under data_dir; reuse the fixture instead
    args.synthetic = False
    grid_search_main(args, parser, unparsed, dataset_name="imageclef",
                     ckpt_prefix="clef")

    gtxt = tmp_path / f"grid_search_nodes_{N_OBJ}.txt"
    assert gtxt.exists()
    lines = gtxt.read_text().strip().splitlines()
    assert len(lines) == 1 and "neighbors: 4, kernels: 3" in lines[0]

    ckpts = os.listdir(tmp_path / "save")
    assert any(c.startswith(f"clef_{N_OBJ}_3_4_") for c in ckpts)

    csvs = os.listdir(tmp_path / "figures")
    assert len(csvs) == 1
    body = (tmp_path / "figures" / csvs[0]).read_text().splitlines()
    assert body[0] == "image_id,question,prediction,answer"
    assert len(body) == 1 + 32  # all val questions
    assert body[1].count(",") == 3


def test_train_flag_str2bool():
    """`--train False` must parse as False. The reference's type=bool
    (run_imageclef.py:249) makes any non-empty string truthy; PARITY.md
    records this as a fixed divergence."""
    import pytest

    from vqa_project_tpu.cli.medical import medical_input_args

    assert medical_input_args([])[0].train is True
    assert medical_input_args(["--train"])[0].train is True
    for s in ("False", "false", "0", "no"):
        assert medical_input_args(["--train", s])[0].train is False
    for s in ("True", "true", "1", "yes"):
        assert medical_input_args(["--train", s])[0].train is True
    with pytest.raises(SystemExit):
        medical_input_args(["--train", "maybe"])


def test_grid_search_single_cache_push(clef_dir, tmp_path, monkeypatch):
    """A multi-cell grid search pushes the feature table to devices
    exactly ONCE (VERDICT round 2 item 7): the grid driver prebuilds
    (mesh, cache) and fit/evaluate accept them instead of rebuilding."""
    from vqa_project_tpu.train import loop as loop_mod

    calls = {"n": 0}
    real = loop_mod.make_feature_cache

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(loop_mod, "make_feature_cache", counting)
    monkeypatch.chdir(tmp_path)
    args, parser, unparsed = medical_input_args([
        "--synthetic", "--data_dir", clef_dir,
        "--save_dir", str(tmp_path / "save"),
        "--plot_dir", str(tmp_path / "figures"),
        "--ep", "1", "--bsize", "8", "--hid", "24", "--emb", "16",
        "--n_obj", str(N_OBJ), "--compute_dtype", "float32",
        "--neighbors_list", "4", "3", "--kernels_list", "3",
    ])
    args.synthetic = False
    grid_search_main(args, parser, unparsed, dataset_name="imageclef",
                     ckpt_prefix="clef")
    # imageclef shares one store for train/val -> exactly one build
    # across 2 grid cells x (fit + evaluate)
    assert calls["n"] == 1
