"""Preprocessor tests over miniature raw fixtures."""

import base64
import csv
import json
import os

import numpy as np
import pytest
import torch

from vqa_project_tpu.data import GraphVQADataset, open_group
from vqa_project_tpu.data.preprocess.image_features import features_to_zarr
from vqa_project_tpu.data.preprocess.medical import (
    merge_box_feat,
    preprocess_imageclef,
    preprocess_mimic,
)
from vqa_project_tpu.data.preprocess.text import (
    combine_qa,
    process_answers,
    process_questions,
    run_phase,
    tokenize,
    tokenize_questions,
)
from vqa_project_tpu.data.vocab import load_vocab


def test_tokenize_strips_question_marks():
    toks = tokenize("What color is the dog?")
    assert toks == ["what", "color", "is", "the", "dog"]
    assert tokenize("Is it red? yes") == ["is", "it", "red", "yes"]
    # exact reference semantics (preprocess_text.py:106-107): a standalone
    # '?' becomes an empty-string token (counts toward qlen/vocab), and
    # ANY token containing '?' loses its last character
    assert tokenize("Is it red ?") == ["is", "it", "red", ""]
    assert tokenize("wh?at") == ["wh?a"]


def _raw_vqa_fixture(raw_dir):
    os.makedirs(raw_dir, exist_ok=True)
    questions = {"questions": [
        {"question": "What color is the sky?", "question_id": 1,
         "image_id": 100},
        {"question": "How many dogs?", "question_id": 2, "image_id": 101},
    ]}
    annotations = {"annotations": [
        {"question_id": 1, "multiple_choice_answer": "blue",
         "answers": [{"answer": "blue"}] * 8 + [{"answer": "gray"}] * 2},
        {"question_id": 2, "multiple_choice_answer": "2",
         "answers": [{"answer": "2"}] * 10},
    ]}
    json.dump(questions, open(os.path.join(
        raw_dir, "v2_OpenEnded_mscoco_train2014_questions.json"), "w"))
    json.dump(annotations, open(os.path.join(
        raw_dir, "v2_mscoco_train2014_annotations.json"), "w"))


def test_text_pipeline_end_to_end(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path)
    _raw_vqa_fixture(raw)
    run_phase("train", raw, out, n_answers=3)

    rows = json.load(open(tmp_path / "vqa_train_final_3.json"))
    assert rows[0]["question_toked"][0] == "what"
    # answer vocab is built from multiple_choice_answer only
    # (preprocess_text.py:40-45), so 'gray' is out-of-vocab and blue's 8
    # accepted votes normalize to 8/8 = 1.0
    scores = dict(rows[0]["answers_w_scores"])
    assert scores["blue"] == pytest.approx(1.0)
    assert "gray" not in scores

    q_itow, q_wtoi = load_vocab(str(tmp_path / "train_q_dict.p"))
    assert min(q_itow) == 1  # 1-indexed questions
    a_itow, a_wtoi = load_vocab(str(tmp_path / "train_a_dict.p"))
    assert min(a_itow) == 0  # 0-indexed answers
    assert set(a_wtoi) == {"blue", "2"}


def test_features_to_zarr_roundtrip(tmp_path, rng):
    # build a miniature 36-box TSV with base64 payloads
    tsv = str(tmp_path / "mini.tsv")
    n, fd = 5, 12
    truth = {}
    with open(tsv, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for iid in (7, 8):
            bx = rng.uniform(0, 300, size=(n, 4)).astype(np.float32)
            ft = rng.normal(size=(n, fd)).astype(np.float32)
            truth[str(iid)] = (bx, ft)
            w.writerow([iid, 320, 240, n,
                        base64.b64encode(bx.tobytes()).decode(),
                        base64.b64encode(ft.tobytes()).decode()])

    features_to_zarr("trainval", [tsv], str(tmp_path))
    feats = open_group(str(tmp_path / "trainval.zarr"))
    boxes = open_group(str(tmp_path / "trainval_boxes.zarr"))
    for iid, (bx, ft) in truth.items():
        np.testing.assert_array_equal(np.asarray(boxes[iid]), bx)
        np.testing.assert_array_equal(np.asarray(feats[iid]), ft)
    sizes = open(tmp_path / "trainval_image_size.csv").read().splitlines()
    assert sizes[0].split(",")[1:] == ["7", "8"]
    assert sizes[1].split(",")[1:] == ["320", "320"]


def _medical_dumps(tmp_path, rng, n_images=4, per=17, fd=10):
    """Three .pt dumps in the reference's {'feat','image_id','img_sizes'}
    schema; detect/gaze rows have 6 trailing extras, gaze_on_detect 4."""
    def dump(name, extras):
        feats, ids, sizes = [], [], []
        for i in range(n_images):
            rows = rng.normal(size=(per + 2, fd + extras)).astype(
                np.float32)
            # bbox columns: [-6:-2] for detect/gaze, [-4:] for gaze_on_det
            hi = -extras + 4 if extras > 4 else None
            rows[:, -extras:hi] = rng.uniform(0, 200, size=(per + 2, 4))
            feats.append(torch.from_numpy(rows))
            ids.append(f"img{i}.jpg")
            sizes.append((240, 320))
        path = str(tmp_path / name)
        torch.save({"feat": feats, "image_id": ids, "img_sizes": sizes},
                   path)
        return path

    det = dump("detect.pt", 6)
    gaze = dump("gaze.pt", 6)
    god = dump("gaze_on_detect.pt", 4)
    return det, gaze, god


def test_merge_box_feat_shapes(tmp_path, rng):
    det, gaze, god = _medical_dumps(tmp_path, rng)
    merged = merge_box_feat(*map(
        lambda p: torch.load(p, weights_only=False), (det, gaze, god)))
    assert len(merged) == 4
    item = merged["img0.jpg"]
    assert item["feat"].shape == (51, 10)
    assert item["boxes"].shape == (51, 4)
    # dumps carry (h, w) = (240, 320); merge returns (w, h)
    assert item["size"] == (320, 240)


def test_preprocess_imageclef_end_to_end(tmp_path, rng):
    det, gaze, god = _medical_dumps(tmp_path, rng)
    qa = str(tmp_path / "qa.txt")
    with open(qa, "w") as f:
        f.write("img0|what organ is shown?|lung\n")
        f.write("img1|is there a fracture?|no\n")
        f.write("imgMISSING|bogus?|x\n")  # filtered out
    rows = preprocess_imageclef(det, gaze, god, [qa], str(tmp_path))
    assert len(rows) == 2
    ds = GraphVQADataset.imageclef(str(tmp_path), n_obj=51)
    assert ds.n_questions == 2
    assert ds.n_obj == 51
    assert ds.feat_dim == 10 + 4


def test_preprocess_mimic_end_to_end(tmp_path, rng):
    det, gaze, god = _medical_dumps(tmp_path, rng)
    qa = str(tmp_path / "mimic_all_qa_pairs.csv")
    with open(qa, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["dicom_id", "question", "answer"])
        w.writeheader()
        for i in range(6):
            w.writerow({"dicom_id": f"img{i % 4}",
                        "question": f"is finding {i} present?",
                        "answer": "yes;no;yes"})
    for split, lo_hi in (("train", (0, 4)), ("val", (4, 6))):
        preprocess_mimic(det, gaze, god, qa, split, str(tmp_path),
                         train_rows=4, test_rows=2)
    tr = GraphVQADataset.mimic(str(tmp_path), "train", n_obj=51)
    va = GraphVQADataset.mimic(str(tmp_path), "val", n_obj=51)
    assert tr.n_questions == 4 and va.n_questions == 2
    # ';'-split answers counted: yes=2, no=1
    a, v = tr.table.dense_answers(np.arange(1))
    assert v.max() == 2.0
