"""Synthetic mini-dataset generator emitting REAL on-disk artifacts.

Writes the exact artifact set the VQA v2 adapters consume (zarr feature
and box groups, *_image_size.csv, train_q_dict.p / train_a_dict.p,
vqa_{train,val}_final_3000.json, vqa_test_toked.json) so the whole ingest
path — zarr reader, packing, vocab, batching — is exercised end-to-end in
tests and benchmarks without the 60 GB VQA download.

The generated task is learnable: the answer is a deterministic function
of the question tokens and of one region feature, so training accuracy
climbing above chance is a meaningful signal.
"""

from __future__ import annotations

import json
import os

import numpy as np

from vqa_project_tpu.data.vocab import save_vocab
from vqa_project_tpu.data.zarr_store import ZarrWriter


def ensure_synthetic_images(data_dir: str, seed: int = 7) -> str:
    """Backfill raw JPEGs for an already-generated synthetic dataset
    (one per id in the trainval size CSV), returning the images dir."""
    import matplotlib.pyplot as plt

    from vqa_project_tpu.data.datasets import _read_sizes_csv

    image_dir = os.path.join(data_dir, "images")
    os.makedirs(image_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sizes = _read_sizes_csv(
        os.path.join(data_dir, "trainval_image_size.csv"))
    for iid, wh in sizes.items():
        path = os.path.join(image_dir, f"{iid}.jpg")
        if os.path.exists(path):
            continue
        w, h = int(wh[0]), int(wh[1])
        raster = rng.integers(0, 255, size=(h // 8, w // 8, 3),
                              dtype=np.uint8)
        plt.imsave(path, raster)
    return image_dir


def generate_synthetic_vqa(
    data_dir: str,
    n_images: int = 24,
    n_questions: int = 96,
    n_obj: int = 36,
    feat_dim: int = 64,
    q_vocab: int = 40,
    n_answers: int = 12,
    seed: int = 1000,
    splits=("train", "val"),
    with_test: bool = False,
    with_images: bool = False,
    n_classes: int = 0,
    class_encoding: str = "scalar",
) -> str:
    """n_classes decouples the number of distinct image classes from the
    answer-vocabulary size (default 0 -> n_answers // 2, the historical
    coupling): the full-width convergence proof needs the REAL 3001-way
    answer head but a class count a model can actually discriminate.

    class_encoding="binary" writes the class id as +/-2 bits across the
    first ceil(log2(n_classes)) feature channels instead of one raw
    scalar in channel 0 — 1500 ordinal levels on a single channel is a
    thresholding task no 3001-way readout learns in reasonable time,
    while binary bits are linearly separable at any class count."""
    n_classes = n_classes or n_answers // 2
    if 2 * n_classes > n_answers:
        # each class owns TWO answer words (one per question type), so
        # the answer vocabulary must hold 2*n_classes entries; a bare
        # assert would strip under python -O and crash later with an
        # unexplained IndexError inside the row generator
        raise ValueError(
            f"n_answers={n_answers} is too small for "
            f"n_classes={n_classes}: the two question types index "
            f"answer words up to 2*n_classes-1={2 * n_classes - 1}; "
            "raise --synthetic_answers or lower --synthetic_classes")
    n_bits = max(1, int(np.ceil(np.log2(max(n_classes, 2)))))
    if class_encoding == "binary" and n_bits > feat_dim:
        raise ValueError(
            f"class_encoding='binary' needs ceil(log2(n_classes))="
            f"{n_bits} feature channels to write the class bits, but "
            f"feat_dim={feat_dim}; raise feat_dim or lower n_classes")
    rng = np.random.default_rng(seed)
    os.makedirs(data_dir, exist_ok=True)
    image_dir = os.path.join(data_dir, "images")
    if with_images:
        os.makedirs(image_dir, exist_ok=True)

    # --- image features + boxes + sizes ---
    feats = ZarrWriter(os.path.join(data_dir, "trainval.zarr"))
    boxes = ZarrWriter(os.path.join(data_dir, "trainval_boxes.zarr"))
    sizes = {}
    img_class = {}
    for i in range(n_images):
        iid = str(100 + i)
        w, h = int(rng.integers(300, 640)), int(rng.integers(300, 640))
        f = rng.standard_normal((n_obj, feat_dim)).astype(np.float32)
        cls = int(rng.integers(0, n_classes))
        img_class[iid] = cls
        if class_encoding == "binary":
            bits = (cls >> np.arange(n_bits)) & 1
            f[:, :n_bits] = (2.0 * bits - 1.0) * 2.0
        else:
            f[:, 0] = cls  # learnable signal channel
        xy1 = rng.uniform(0, 0.5, size=(n_obj, 2))
        wh = rng.uniform(0.05, 0.45, size=(n_obj, 2))
        b = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
        b[:, [0, 2]] *= w
        b[:, [1, 3]] *= h
        feats.create_dataset(iid, f)
        boxes.create_dataset(iid, b)
        sizes[iid] = (w, h)
        if with_images:
            # small raw JPEG so the interpretability plots can draw the
            # learned graph over a real raster (plot.py:448-453 parity)
            import matplotlib.pyplot as plt

            raster = rng.integers(0, 255, size=(h // 8, w // 8, 3),
                                  dtype=np.uint8)
            plt.imsave(os.path.join(image_dir, f"{iid}.jpg"), raster)

    from vqa_project_tpu.data.datasets import write_sizes_csv

    ids = list(sizes.keys())
    write_sizes_csv(os.path.join(data_dir, "trainval_image_size.csv"),
                    sizes)

    # --- vocabularies ---
    q_words = [f"word{i}" for i in range(q_vocab)]
    q_itow = {i + 1: w for i, w in enumerate(q_words)}
    q_wtoi = {w: i + 1 for i, w in enumerate(q_words)}
    save_vocab(os.path.join(data_dir, "train_q_dict.p"), q_itow, q_wtoi)

    a_words = [f"answer{i}" for i in range(n_answers)]
    a_itow = {i: w for i, w in enumerate(a_words)}
    a_wtoi = {w: i for i, w in enumerate(a_words)}
    save_vocab(os.path.join(data_dir, "train_a_dict.p"), a_itow, a_wtoi)

    # --- QA jsons ---
    def make_rows(count, qid0):
        rows = []
        for j in range(count):
            iid = ids[int(rng.integers(0, n_images))]
            qlen = int(rng.integers(3, 9))
            toks = [q_words[int(rng.integers(0, q_vocab))]
                    for _ in range(qlen)]
            qtype = int(rng.integers(0, 2))
            toks[0] = q_words[qtype]  # question type token
            ans = a_words[img_class[iid] * 2 + qtype]
            rows.append({
                "question": " ".join(toks) + "?",
                "question_id": qid0 + j,
                "image_id": iid,
                "question_toked": toks,
                "answer": ans,
                "answers": [[ans, 10]],
                "answers_w_scores": [[ans, 1.0]],
            })
        return rows

    n_train = int(n_questions * 0.75)
    json.dump(make_rows(n_train, 0),
              open(os.path.join(data_dir, "vqa_train_final_3000.json"), "w"))
    json.dump(make_rows(n_questions - n_train, 10_000),
              open(os.path.join(data_dir, "vqa_val_final_3000.json"), "w"))

    if with_test:
        # test artifacts: separate zarr + size csv + un-annotated json
        tf = ZarrWriter(os.path.join(data_dir, "test.zarr"))
        tb = ZarrWriter(os.path.join(data_dir, "test_boxes.zarr"))
        for iid in ids[: max(2, n_images // 4)]:
            tf.create_dataset(iid, np.asarray(
                ZarrWriter(os.path.join(data_dir, "trainval.zarr"))[iid]))
            tb.create_dataset(iid, np.asarray(
                ZarrWriter(os.path.join(data_dir, "trainval_boxes.zarr"))[iid]))
        tids = ids[: max(2, n_images // 4)]
        write_sizes_csv(os.path.join(data_dir, "test_image_size.csv"),
                        {i: sizes[i] for i in tids})
        rows = make_rows(n_questions // 4, 20_000)
        for r in rows:
            r["image_id"] = tids[int(rng.integers(0, len(tids)))]
            del r["answers"], r["answers_w_scores"], r["answer"]
        json.dump(rows,
                  open(os.path.join(data_dir, "vqa_test_toked.json"), "w"))

    return data_dir
