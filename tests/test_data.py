"""Data-path tests over the synthetic on-disk fixture."""

import json
import os

import numpy as np
import pytest

from vqa_project_tpu.data import (
    Batcher,
    GraphVQADataset,
    ZarrWriter,
    open_group,
)
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa

N_OBJ, FEAT, NQ = 10, 20, 40


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    generate_synthetic_vqa(
        str(d), n_images=6, n_questions=NQ, n_obj=N_OBJ, feat_dim=FEAT,
        q_vocab=15, n_answers=8, with_test=True)
    return str(d)


def test_zarr_roundtrip(tmp_path, rng):
    w = ZarrWriter(str(tmp_path / "g.zarr"))
    a = rng.normal(size=(7, 13)).astype(np.float32)
    b = rng.integers(0, 100, size=(4,)).astype(np.int64)
    w.create_dataset("a", a)
    w.create_dataset("b", b)
    g = open_group(str(tmp_path / "g.zarr"))
    assert set(g.keys()) == {"a", "b"}
    np.testing.assert_array_equal(np.asarray(g["a"]), a)
    np.testing.assert_array_equal(np.asarray(g["b"]), b)
    np.testing.assert_array_equal(g["a"][2:5, 1], a[2:5, 1])


def test_zarr_uncompressed_roundtrip(tmp_path, rng):
    w = ZarrWriter(str(tmp_path / "u.zarr"))
    w.compress = False
    a = rng.normal(size=(3, 5, 2)).astype(np.float32)
    w.create_dataset("x", a)
    g = open_group(str(tmp_path / "u.zarr"))
    np.testing.assert_array_equal(np.asarray(g["x"]), a)


def test_dataset_attributes(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    assert ds.feat_dim == FEAT + 4
    assert ds.n_obj == N_OBJ
    assert ds.q_words == 16          # 15 vocab + 1
    assert ds.n_answers == 9         # 8 answers + 1
    assert ds.n_questions == 30      # 75% of 40
    assert ds.pretrained_wemb.shape == (16, 300)


def test_bbox_normalized(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    boxes = np.asarray(ds.store.boxes)
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0 + 1e-6
    # xyxy ordering preserved
    assert (boxes[..., 2] >= boxes[..., 0]).all()
    assert (boxes[..., 3] >= boxes[..., 1]).all()


def test_dense_answers_match_json(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    rows = np.arange(5)
    a, v = ds.table.dense_answers(rows)
    assert a.shape == (5, ds.n_answers)
    for i in range(5):
        row = ds.vqa[i]
        for w, c in row["answers_w_scores"]:
            assert a[i, ds.a_wtoi[w]] == pytest.approx(c)
        assert a[i].sum() == pytest.approx(
            sum(c for _, c in row["answers_w_scores"]))
        for w, c in row["answers"]:
            assert v[i, ds.a_wtoi[w]] == pytest.approx(c)


def test_batcher_shapes_and_padding(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    bs = 8
    b = Batcher(ds, batch_size=bs, shuffle=False)
    batches = list(b)
    assert len(b) == -(-ds.n_questions // bs)
    total_valid = 0
    for batch in batches:
        assert batch["question"].shape == (bs, ds.max_qlen)
        assert batch["image"].shape == (bs, N_OBJ, ds.feat_dim)
        assert batch["answers"].shape == (bs, ds.n_answers)
        assert batch["qlen"].min() >= 1
        total_valid += int(batch["mask"].sum())
    assert total_valid == ds.n_questions


def test_batcher_shuffle_determinism(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    b1 = Batcher(ds, batch_size=4, shuffle=True, seed=7)
    b2 = Batcher(ds, batch_size=4, shuffle=True, seed=7)
    q1 = next(iter(b1))["qid"]
    q2 = next(iter(b2))["qid"]
    np.testing.assert_array_equal(q1, q2)
    # different epoch -> different order
    q1b = next(iter(b1))["qid"]
    assert not np.array_equal(q1, q1b)


def test_trainval_split_concatenates(data_dir):
    tr = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    va = GraphVQADataset.vqa2(data_dir, split="val", n_obj=N_OBJ)
    tv = GraphVQADataset.vqa2(data_dir, split="trainval", n_obj=N_OBJ)
    assert tv.n_questions == tr.n_questions + va.n_questions


def test_test_split_loads_without_answers(data_dir):
    ds = GraphVQADataset.vqa2(data_dir, split="test", n_obj=N_OBJ)
    batch = next(iter(Batcher(ds, batch_size=4)))
    assert batch["answers"].sum() == 0.0
    assert batch["votes"].sum() == 0.0
    assert batch["qid"].min() >= 20_000


def test_packed_cache_reused(data_dir):
    ds1 = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    cache = os.path.join(data_dir, "_tpu_cache")
    n_before = len(os.listdir(cache))
    ds2 = GraphVQADataset.vqa2(data_dir, split="train", n_obj=N_OBJ)
    assert len(os.listdir(cache)) == n_before
    np.testing.assert_array_equal(
        np.asarray(ds1.store.features), np.asarray(ds2.store.features))


def test_zarr_multi_chunk_read(tmp_path, rng):
    """Real zarr-python artifacts may be chunked; the reader assembles
    chunk grids (incl. ragged edge chunks and missing chunks)."""
    import json as _json
    import zlib

    a = rng.normal(size=(10, 7)).astype(np.float32)
    root = tmp_path / "g.zarr"
    apath = root / "x"
    apath.mkdir(parents=True)
    (root / ".zgroup").write_text(_json.dumps({"zarr_format": 2}))
    chunks = (4, 3)
    meta = {"zarr_format": 2, "shape": [10, 7], "chunks": list(chunks),
            "dtype": "<f4", "compressor": {"id": "zlib", "level": 1},
            "fill_value": 0, "filters": None, "order": "C"}
    (apath / ".zarray").write_text(_json.dumps(meta))
    for ci in range(3):
        for cj in range(3):
            if (ci, cj) == (2, 2):
                continue  # missing chunk -> fill_value
            block = np.zeros(chunks, np.float32)
            rows = a[ci * 4:(ci + 1) * 4, cj * 3:(cj + 1) * 3]
            block[:rows.shape[0], :rows.shape[1]] = rows
            (apath / f"{ci}.{cj}").write_bytes(
                zlib.compress(block.tobytes(), 1))
    g = open_group(str(root))
    got = np.asarray(g["x"])
    expected = a.copy()
    expected[8:10, 6:7] = 0.0  # the missing chunk region
    np.testing.assert_array_equal(got, expected)


def test_synthetic_binary_encoding_validates_feat_dim(tmp_path):
    """binary class encoding needs ceil(log2(n_classes)) channels; an
    undersized feat_dim must be a clear ValueError, not a numpy
    broadcast crash deep inside generation."""
    with pytest.raises(ValueError, match="feat_dim"):
        generate_synthetic_vqa(
            str(tmp_path / "s"), n_images=4, n_questions=8, feat_dim=8,
            n_answers=3000, n_classes=1500, class_encoding="binary")
