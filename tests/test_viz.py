"""Visualization-layer tests."""

import os

import numpy as np
import pytest

from vqa_project_tpu.utils import clean_str, xywh2xyxy, xyxy2xywh
from vqa_project_tpu.viz import (
    node_weights_from_adjacency,
    plot_adjacency_graph,
    read_adj,
    save_predictions_csv,
)
from vqa_project_tpu.viz.plots import find_question


def test_bbox_converters_roundtrip(rng):
    xyxy = rng.uniform(0, 1, size=(7, 4)).astype(np.float32)
    xyxy[:, 2:] += 1.0  # ensure x2>x1, y2>y1
    back = xywh2xyxy(xyxy2xywh(xyxy))
    np.testing.assert_allclose(back, xyxy, rtol=1e-6, atol=1e-6)


def test_clean_str():
    assert clean_str("a|b@c?") == "a_b_c_"
    assert clean_str("plain") == "plain"


def test_node_weights(rng):
    adj = rng.uniform(size=(5, 5)).astype(np.float32)
    w = node_weights_from_adjacency(adj)
    np.testing.assert_allclose(w, adj.sum(-1), rtol=1e-6)


def test_plot_adjacency_graph_writes_figure(tmp_path, rng):
    k = 10
    xy1 = rng.uniform(0, 0.5, size=(k, 2))
    wh = rng.uniform(0.05, 0.4, size=(k, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=-1)
    adj = rng.uniform(size=(k, k)).astype(np.float32)
    path = str(tmp_path / "fig.jpg")
    plot_adjacency_graph(boxes, adj, question="what is this?",
                         prediction="cat", answer="dog", path=path)
    assert os.path.getsize(path) > 5_000


def test_predictions_csv(tmp_path):
    rows = [{"image_id": "1", "question": "q?", "prediction": "a",
             "answer": "b"}]
    p = str(tmp_path / "preds.csv")
    save_predictions_csv(rows, p)
    lines = open(p).read().splitlines()
    assert lines[0] == "image_id,question,prediction,answer"
    assert lines[1] == "1,q?,a,b"


def test_read_adj_roundtrip(tmp_path, rng):
    adj = rng.uniform(size=(3, 5, 5)).astype(np.float32)
    p = str(tmp_path / "adj.npz")
    np.savez_compressed(p, adjacency=adj)
    out = read_adj(p)
    np.testing.assert_array_equal(out["adjacency"], adj)


def test_find_question():
    rows = [
        {"question": "What color is the sky?", "image_id": "42"},
        {"question": "How many dogs?", "image_id": "7"},
    ]
    assert find_question(rows, "what color is the sky") == 0
    assert find_question(rows, "How many dogs?", image_id="7") == 1
    assert find_question(rows, "How many dogs?", image_id="9") is None
    assert find_question(rows, "missing?") is None


def test_visualize_checkpoint_end_to_end(tmp_path):
    """Full viz driver over a tiny trained model."""
    import jax

    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import GraphVQADataset
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.train.loop import fit
    from vqa_project_tpu.viz import visualize_checkpoint

    d = str(tmp_path / "data")
    generate_synthetic_vqa(d, n_images=6, n_questions=24, n_obj=8,
                           feat_dim=16, q_vocab=12, n_answers=6)
    ds = GraphVQADataset.vqa2(d, "val", n_obj=8, max_qlen=10)
    mcfg = ModelConfig(emb_dim=16, hid_dim=24, combined_dim=12,
                       n_kernels=3, neighbourhood_size=3, dropout=0.1,
                       max_qlen=10, compute_dtype="float32")
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=8, eval_interval=0,
                       log_interval=1000)
    model, state, _ = fit(tcfg, mcfg,
                          GraphVQADataset.vqa2(d, "train", n_obj=8,
                                               max_qlen=10))
    out = visualize_checkpoint(model, state.params, ds,
                               str(tmp_path / "figs"), batch_size=8,
                               n_batches=1)
    files = os.listdir(out)
    assert "infer_predictions.csv" in files
    assert "adjacencies.npz" in files
    assert "summary.json" in files
    assert sum(f.endswith(".jpg") for f in files) == 6  # n_questions in val


def test_plot_on_image_contains_raster(rng):
    """With image= the figure must contain the photo raster and the boxes
    must land inside it (plot.py:448-453 paper-Fig-4 parity)."""
    import matplotlib.pyplot as plt

    k = 6
    xy1 = rng.uniform(0, 0.5, size=(k, 2))
    wh = rng.uniform(0.05, 0.4, size=(k, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=-1)
    adj = rng.uniform(size=(k, k)).astype(np.float32)
    raster = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    fig = plot_adjacency_graph(boxes, adj, image=raster, question="q?")
    ax = fig.axes[0]
    assert len(ax.images) == 1
    shown = ax.images[0].get_array()
    assert shown.shape[:2] == (60, 80)
    # boxes were scaled into the raster's pixel frame
    for p in ax.patches:
        x, y = p.get_xy()
        assert 0 <= x <= 80 and 0 <= y <= 60
    plt.close(fig)


def test_resolve_image_path(tmp_path):
    from vqa_project_tpu.viz import load_image, resolve_image_path

    d = str(tmp_path)
    import matplotlib.pyplot as plt

    img = np.zeros((8, 8, 3), np.uint8)
    plt.imsave(os.path.join(d, "COCO_val2014_000000000042.jpg"), img)
    plt.imsave(os.path.join(d, "synpic123.jpg"), img)
    assert resolve_image_path(d, 42).endswith(
        "COCO_val2014_000000000042.jpg")
    assert resolve_image_path(d, "42").endswith(
        "COCO_val2014_000000000042.jpg")
    assert resolve_image_path(d, "synpic123.jpg").endswith("synpic123.jpg")
    assert resolve_image_path(d, "synpic123").endswith("synpic123.jpg")
    assert resolve_image_path(d, 999) is None
    assert resolve_image_path(None, 42) is None
    assert load_image(None) is None
    assert load_image(resolve_image_path(d, 42)).shape == (8, 8, 3)


def test_visualize_checkpoint_subset_eval_on_images(tmp_path):
    """n_questions >> figures: only n_batches batches are evaluated, and
    with image_dir the figures are drawn over the raw JPEGs."""
    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import GraphVQADataset
    from vqa_project_tpu.data.synthetic import (
        ensure_synthetic_images,
        generate_synthetic_vqa,
    )
    from vqa_project_tpu.train.loop import fit
    from vqa_project_tpu.viz import visualize_checkpoint

    d = str(tmp_path / "data")
    generate_synthetic_vqa(d, n_images=8, n_questions=192, n_obj=8,
                           feat_dim=16, q_vocab=12, n_answers=6)
    image_dir = ensure_synthetic_images(d)
    ds = GraphVQADataset.vqa2(d, "val", n_obj=8, max_qlen=10)
    assert ds.n_questions >= 40  # >> the 8 figures rendered below
    mcfg = ModelConfig(emb_dim=16, hid_dim=24, combined_dim=12,
                       n_kernels=3, neighbourhood_size=3, dropout=0.1,
                       max_qlen=10, compute_dtype="float32")
    tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=8, eval_interval=0,
                       log_interval=1000)
    model, state, _ = fit(tcfg, mcfg,
                          GraphVQADataset.vqa2(d, "train", n_obj=8,
                                               max_qlen=10))
    out = visualize_checkpoint(model, state.params, ds,
                               str(tmp_path / "figs"), batch_size=8,
                               n_batches=1, image_dir=image_dir)
    files = os.listdir(out)
    # exactly ONE batch was evaluated and collected — not the full split
    npz = read_adj(os.path.join(out, "adjacencies.npz"))
    assert npz["adjacency"].shape[0] == 8
    assert sum(f.endswith(".jpg") for f in files) == 8
    import json as _json

    summary = _json.load(open(os.path.join(out, "summary.json")))
    assert summary["figures"] == 8
    assert summary["eval_batches"] == 1


def test_plot_given_question_on_image(tmp_path):
    import jax
    import jax.numpy as jnp

    from vqa_project_tpu.config import ModelConfig
    from vqa_project_tpu.data import Batcher, GraphVQADataset
    from vqa_project_tpu.data.synthetic import (
        ensure_synthetic_images,
        generate_synthetic_vqa,
    )
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.viz.plots import plot_given_question

    d = str(tmp_path / "data")
    generate_synthetic_vqa(d, n_images=4, n_questions=12, n_obj=6,
                           feat_dim=12, q_vocab=10, n_answers=4)
    image_dir = ensure_synthetic_images(d)
    ds = GraphVQADataset.vqa2(d, "train", n_obj=6, max_qlen=10)
    mcfg = ModelConfig(emb_dim=12, hid_dim=16, combined_dim=8,
                       n_kernels=2, neighbourhood_size=3, dropout=0.1,
                       max_qlen=10, compute_dtype="float32")
    model = build_model(mcfg, ds)
    sample = next(iter(Batcher(ds, 2)))
    params = model.init(jax.random.key(0),
                        jnp.asarray(sample["question"]),
                        jnp.asarray(sample["image"]),
                        jnp.asarray(sample["qlen"]))
    fig = plot_given_question(model, params, ds, ds.vqa[0]["question"],
                              image_dir=image_dir)
    assert len(fig.axes[0].images) == 1
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_cv2_renderer(tmp_path, rng):
    from vqa_project_tpu.viz.cv2_plots import plot_boxes

    k = 9
    xy1 = rng.uniform(0, 0.5, size=(k, 2))
    wh = rng.uniform(0.05, 0.4, size=(k, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=-1)
    adj = rng.uniform(size=(k, k)).astype(np.float32)
    path = str(tmp_path / "cv2fig.jpg")
    img = plot_boxes(boxes, adj, caption="what is this? pred: cat",
                     path=path)
    assert img.shape == (480, 640, 3)
    assert os.path.getsize(path) > 3_000


def test_plot_given_question(tmp_path):
    import jax

    from vqa_project_tpu.config import ModelConfig
    from vqa_project_tpu.data import Batcher, GraphVQADataset
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.viz.plots import plot_given_question
    import jax.numpy as jnp

    d = str(tmp_path / "data")
    generate_synthetic_vqa(d, n_images=4, n_questions=12, n_obj=6,
                           feat_dim=12, q_vocab=10, n_answers=4)
    ds = GraphVQADataset.vqa2(d, "train", n_obj=6, max_qlen=10)
    mcfg = ModelConfig(emb_dim=12, hid_dim=16, combined_dim=8,
                       n_kernels=2, neighbourhood_size=3, dropout=0.1,
                       max_qlen=10, compute_dtype="float32")
    model = build_model(mcfg, ds)
    sample = next(iter(Batcher(ds, 2)))
    params = model.init(jax.random.key(0),
                        jnp.asarray(sample["question"]),
                        jnp.asarray(sample["image"]),
                        jnp.asarray(sample["qlen"]))
    q = ds.vqa[0]["question"]
    path = str(tmp_path / "one.jpg")
    plot_given_question(model, params, ds, q, path=path)
    assert os.path.getsize(path) > 5_000
    import pytest

    with pytest.raises(KeyError):
        plot_given_question(model, params, ds, "not a real question?")
