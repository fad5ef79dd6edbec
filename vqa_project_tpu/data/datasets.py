"""Dataset adapters: VQA v2, ImageCLEF-VQA-Med, MIMIC-CXR, synthetic.

Parity targets: VQA_Dataset / VQA_Dataset_Test / ImageclefDataset /
MimicDataset (/root/reference/torch_dataset.py). Same on-disk artifacts
(zarr feature/box groups, *_image_size.csv, vocab pickles, QA json), same
per-item semantics (100-capacity padded questions truncated here to the
model's fixed max_qlen, soft answer scores, vote counts, bbox normalized
by image size and concatenated to features).

TPU-first redesign: the reference does a python-level zarr read + bbox
loop per __getitem__ across 4-5 dataloader workers. Here ingest is packed
ONCE into contiguous memmapped arrays (features, normalized boxes) plus
dense per-question token/answer tables, so a training batch is a handful
of vectorized numpy gathers — no per-item python, no worker processes,
fast enough to feed an 8-chip mesh from one host (SURVEY.md "Data stall
risk").
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from vqa_project_tpu.data import zarr_store
from vqa_project_tpu.data.glove import load_glove_embeddings
from vqa_project_tpu.data.vocab import load_vocab

# capacity for per-question sparse answer entries (VQA has <= 10 raters)
_MAX_ANS = 16


def write_sizes_csv(path: str, sizes: Dict[str, Sequence[float]]) -> None:
    """Write the *_image_size.csv artifact (columns = image ids, row 0
    width, row 1 height) — single writer shared by every preprocessor;
    _read_sizes_csv below is its inverse."""
    ids = list(sizes.keys())
    with open(path, "w") as f:
        f.write("," + ",".join(ids) + "\n")
        f.write("0," + ",".join(str(sizes[i][0]) for i in ids) + "\n")
        f.write("1," + ",".join(str(sizes[i][1]) for i in ids) + "\n")


def _read_sizes_csv(path: str) -> Dict[str, np.ndarray]:
    """Parse the *_image_size.csv artifact: columns are image ids, row 0 is
    width, row 1 height (see /root/reference/data/preprocess_image.py:80-90
    for the writer; pandas-free for speed)."""
    with open(path, "r") as f:
        header = f.readline().rstrip("\n").split(",")
        row_w = f.readline().rstrip("\n").split(",")
        row_h = f.readline().rstrip("\n").split(",")
    out = {}
    for iid, w, h in zip(header[1:], row_w[1:], row_h[1:]):
        out[iid] = np.array([float(w), float(h)], dtype=np.float32)
    return out


def _dir_fingerprint(path: str) -> str:
    """Change-detector for a zarr group dir (or a plain file).

    Hashes EVERY member's name/size/mtime plus the stat of its "0.0"
    chunk file — ZarrWriter truncate-overwrites chunk files, which never
    touches the parent dir's mtime, and a partial in-place regeneration
    at unchanged sizes would slip past a sampled check. A 123k-entry
    listdir + stat sweep is a few seconds, vs minutes to repack the
    memmap (and silent staleness if skipped wrongly).
    """
    if not os.path.exists(path):
        return f"missing:{path}"
    st = os.stat(path)
    if os.path.isfile(path):
        return f"f:{st.st_size}:{st.st_mtime_ns}"
    names = sorted(os.listdir(path))
    h = hashlib.md5()
    for name in names:
        p = os.path.join(path, name)
        s = os.stat(p)
        h.update(f"{name}:{s.st_size}:{s.st_mtime_ns};".encode())
        chunk = os.path.join(p, "0.0")
        try:
            cs = os.stat(chunk)
            h.update(f"{cs.st_size}:{cs.st_mtime_ns};".encode())
        except OSError:
            pass
    return f"d:{len(names)}:{h.hexdigest()}"


class FeatureStore:
    """Contiguous memmapped (n_images, K, feat) features + (n_images, K, 4)
    size-normalized xyxy boxes, packed once from zarr groups."""

    def __init__(self, features: np.ndarray, boxes: np.ndarray,
                 id_to_row: Dict[str, int]):
        assert features.shape[0] == boxes.shape[0]
        self.features = features
        self.boxes = boxes
        self.id_to_row = id_to_row
        self.n_obj = features.shape[1]
        self.feat_dim = features.shape[2] + 4  # + bbox, torch_dataset.py:75

    @classmethod
    def from_zarr(cls, feat_path: str, box_path: str, sizes_csv: str,
                  n_obj: int, cache_dir: Optional[str] = None,
                  id_suffix: str = "") -> "FeatureStore":
        """Pack zarr groups into the memmap cache (built once per store)."""
        cache_dir = cache_dir or os.path.join(
            os.path.dirname(feat_path) or ".", "_tpu_cache")
        path_tag = hashlib.sha1(
            f"{os.path.abspath(feat_path)}:{n_obj}".encode()).hexdigest()[:12]
        # staleness key: a regenerated zarr store at the SAME path must
        # not silently reuse the old packed memmap (glove.py keys its
        # cache on size+mtime for the same reason). Cheap: entry count,
        # dir mtimes, and sampled member/chunk stats — a full rewrite
        # touches every chunk's mtime, so the samples catch it.
        fp_tag = hashlib.sha1("|".join(
            _dir_fingerprint(p) for p in (feat_path, box_path, sizes_csv)
        ).encode()).hexdigest()[:12]
        base = os.path.join(cache_dir, f"packed_{path_tag}_{fp_tag}")
        meta_p, feat_p, box_p = (base + ".json", base + "_feat.npy",
                                 base + "_box.npy")
        if all(os.path.exists(p) for p in (meta_p, feat_p, box_p)):
            with open(meta_p) as f:
                meta = json.load(f)
            feats = np.load(feat_p, mmap_mode="r")
            boxes = np.load(box_p, mmap_mode="r")
            return cls(feats, boxes, meta["id_to_row"])
        # superseded packs for this store (older fingerprints) are
        # orphans — a regenerated 123k-image store would otherwise leave
        # multi-GB dead memmaps behind
        if os.path.isdir(cache_dir):
            import glob as _glob

            for stale in _glob.glob(
                    os.path.join(cache_dir, f"packed_{path_tag}_*")):
                try:
                    os.remove(stale)
                except OSError:
                    pass

        fgroup = zarr_store.open_group(feat_path)
        bgroup = zarr_store.open_group(box_path)
        sizes = _read_sizes_csv(sizes_csv)
        ids = fgroup.keys()
        if not ids:
            raise ValueError(f"empty feature store: {feat_path}")
        fdim = fgroup[ids[0]].shape[1]

        os.makedirs(cache_dir, exist_ok=True)
        feats = np.lib.format.open_memmap(
            feat_p, mode="w+", dtype=np.float32,
            shape=(len(ids), n_obj, fdim))
        boxes = np.lib.format.open_memmap(
            box_p, mode="w+", dtype=np.float32,
            shape=(len(ids), n_obj, 4))
        id_to_row: Dict[str, int] = {}
        for row, iid in enumerate(ids):
            farr = np.asarray(fgroup[iid], dtype=np.float32)
            barr = np.asarray(bgroup[iid], dtype=np.float32)
            if not np.isfinite(farr).all():
                # parity: torch_dataset.py:141-142 raises on non-finite
                raise ValueError(f"non-finite features for image {iid}")
            k = min(n_obj, farr.shape[0])
            feats[row, :k] = farr[:k]
            wh = sizes[iid]
            b = barr[:k].copy()
            b[:, 0] /= wh[0]
            b[:, 1] /= wh[1]
            b[:, 2] /= wh[0]
            b[:, 3] /= wh[1]
            boxes[row, :k] = b
            id_to_row[iid] = row
        feats.flush()
        boxes.flush()
        with open(meta_p, "w") as f:
            json.dump({"id_to_row": id_to_row}, f)
        return cls(feats, boxes, id_to_row)

    def batch(self, rows: np.ndarray) -> np.ndarray:
        """(len(rows), K, feat_dim) feature||bbox tensor for a batch."""
        f = np.asarray(self.features[rows])
        b = np.asarray(self.boxes[rows])
        return np.concatenate([f, b], axis=-1)


class QuestionTable:
    """Dense per-question arrays built once from the QA json."""

    def __init__(self, vqa: List[dict], q_wtoi: Dict[str, int],
                 a_wtoi: Dict[str, int], n_answers: int,
                 id_to_row: Dict[str, int], max_qlen: int,
                 image_id_suffix: str = ""):
        n = len(vqa)
        self.n_questions = n
        self.n_answers = n_answers
        self.max_qlen = max_qlen
        self.tokens = np.zeros((n, max_qlen), dtype=np.int32)
        self.qlen = np.zeros((n,), dtype=np.int32)
        self.qid = np.zeros((n,), dtype=np.int64)
        self.image_row = np.zeros((n,), dtype=np.int32)
        # sparse answer entries; pad column index = n_answers - 1, the
        # always-unused +1 slot of the reference's dense vector
        # (torch_dataset.py:54,117 — wtoi values span [0, n_answers-2])
        pad = n_answers - 1
        self.ans_idx = np.full((n, _MAX_ANS), pad, dtype=np.int32)
        self.ans_score = np.zeros((n, _MAX_ANS), dtype=np.float32)
        self.vote_idx = np.full((n, _MAX_ANS), pad, dtype=np.int32)
        self.vote_val = np.zeros((n, _MAX_ANS), dtype=np.float32)

        for r, row in enumerate(vqa):
            toks = row["question_toked"]
            self.qlen[r] = max(1, min(len(toks), max_qlen))
            for i, w in enumerate(toks[:max_qlen]):
                self.tokens[r, i] = q_wtoi.get(w, 0)
            self.qid[r] = int(row["question_id"])
            iid = str(row["image_id"]) + image_id_suffix
            self.image_row[r] = id_to_row[iid]

            for s, (w, c) in enumerate(row.get("answers_w_scores", [])):
                if s >= _MAX_ANS:
                    break
                j = a_wtoi.get(w)
                if j is not None:
                    self.ans_idx[r, s] = j
                    self.ans_score[r, s] = c
            answers = row.get("answers", [])
            if isinstance(answers, dict):  # ImageCLEF stores a dict
                answers = list(answers.items())
            for s, (w, c) in enumerate(answers):
                if s >= _MAX_ANS:
                    break
                j = a_wtoi.get(w)
                if j is not None:
                    self.vote_idx[r, s] = j
                    self.vote_val[r, s] = c

    def dense_answers(self, rows: np.ndarray):
        """Densify (answers, votes) for a batch: (B, C) each."""
        b = len(rows)
        a = np.zeros((b, self.n_answers), dtype=np.float32)
        v = np.zeros((b, self.n_answers), dtype=np.float32)
        ar = np.arange(b)[:, None]
        a[ar, self.ans_idx[rows]] = self.ans_score[rows]
        v[ar, self.vote_idx[rows]] = self.vote_val[rows]
        # clear anything written to the pad column
        a[:, self.n_answers - 1] = 0.0
        v[:, self.n_answers - 1] = 0.0
        return a, v


class GraphVQADataset:
    """A (FeatureStore, QuestionTable, vocab) bundle with the reference's
    dataset attribute surface (q_words, n_answers, a_itow, feat_dim,
    pretrained_wemb, n_questions)."""

    def __init__(self, store: FeatureStore, table: QuestionTable,
                 q_itow, q_wtoi, a_itow, a_wtoi,
                 pretrained_wemb: np.ndarray, vqa: List[dict]):
        self.store = store
        self.table = table
        self.q_itow, self.q_wtoi = q_itow, q_wtoi
        self.a_itow, self.a_wtoi = a_itow, a_wtoi
        self.pretrained_wemb = pretrained_wemb
        self.vqa = vqa
        self.q_words = len(q_itow) + 1
        self.n_answers = len(a_itow) + 1
        self.feat_dim = store.feat_dim
        self.n_obj = store.n_obj
        self.n_questions = table.n_questions
        self.max_qlen = table.max_qlen

    def __len__(self) -> int:
        return self.n_questions

    # ---------------- constructors ----------------

    @classmethod
    def vqa2(cls, data_dir: str, split: str = "train", emb_dim: int = 300,
             n_obj: int = 36, max_qlen: int = 16) -> "GraphVQADataset":
        """VQA v2 splits.

        split: 'train' | 'val' (VQA_Dataset, torch_dataset.py:34-77),
               'trainval' (train+val jsons, VQA_Dataset_Test train=True,
               torch_dataset.py:439-450), 'test' (test2015 artifacts,
               VQA_Dataset_Test train=False).
        """
        q_itow, q_wtoi = load_vocab(os.path.join(data_dir, "train_q_dict.p"))
        a_itow, a_wtoi = load_vocab(os.path.join(data_dir, "train_a_dict.p"))

        if split == "test":
            store_prefix, sizes = "test", "test_image_size.csv"
            vqa = _load_json(os.path.join(data_dir, "vqa_test_toked.json"))
        else:
            store_prefix, sizes = "trainval", "trainval_image_size.csv"
            if split == "train":
                vqa = _load_json(
                    os.path.join(data_dir, "vqa_train_final_3000.json"))
            elif split == "val":
                vqa = _load_json(
                    os.path.join(data_dir, "vqa_val_final_3000.json"))
            elif split == "trainval":
                vqa = (_load_json(
                    os.path.join(data_dir, "vqa_train_final_3000.json")) +
                    _load_json(
                        os.path.join(data_dir, "vqa_val_final_3000.json")))
            else:
                raise ValueError(f"unknown split {split!r}")

        feat_path = os.path.join(
            data_dir,
            "trainval.zarr" if store_prefix == "trainval" else "test.zarr")
        box_path = os.path.join(data_dir, f"{store_prefix}_boxes.zarr")
        store = FeatureStore.from_zarr(
            feat_path, box_path, os.path.join(data_dir, sizes), n_obj)
        return cls._assemble(data_dir, store, vqa, q_itow, q_wtoi,
                             a_itow, a_wtoi, emb_dim, max_qlen)

    @classmethod
    def imageclef(cls, data_dir: str, split: str = "train",
                  emb_dim: int = 300, n_obj: int = 51,
                  max_qlen: int = 16) -> "GraphVQADataset":
        """ImageCLEF-VQA-Med (torch_dataset.py:167-297). Train and val use
        the same json (the reference loads vqa_imageclef_final.json for
        both); image ids are keyed '<id>.jpg'."""
        del split
        q_itow, q_wtoi = load_vocab(
            os.path.join(data_dir, "imageclef_q_dict.p"))
        a_itow, a_wtoi = load_vocab(
            os.path.join(data_dir, "imageclef_a_dict.p"))
        vqa = _load_json(os.path.join(data_dir, "vqa_imageclef_final.json"))
        store = FeatureStore.from_zarr(
            os.path.join(data_dir, "imageclef_features.zarr"),
            os.path.join(data_dir, "imageclef_boxes.zarr"),
            os.path.join(data_dir, "imageclef_image_size.csv"), n_obj)
        return cls._assemble(data_dir, store, vqa, q_itow, q_wtoi,
                             a_itow, a_wtoi, emb_dim, max_qlen,
                             image_id_suffix=".jpg")

    @classmethod
    def mimic(cls, data_dir: str, split: str = "train", emb_dim: int = 300,
              n_obj: int = 51, max_qlen: int = 16) -> "GraphVQADataset":
        """MIMIC-CXR (torch_dataset.py:300-417): split-specific vocab,
        features and QA json."""
        s = "train" if split == "train" else "val"
        q_itow, q_wtoi = load_vocab(
            os.path.join(data_dir, f"mimic_q_{s}_dict.p"))
        a_itow, a_wtoi = load_vocab(
            os.path.join(data_dir, f"mimic_a_{s}_dict.p"))
        vqa = _load_json(os.path.join(data_dir, f"vqa_mimic_{s}_final.json"))
        store = FeatureStore.from_zarr(
            os.path.join(data_dir, f"mimic_{s}_features.zarr"),
            os.path.join(data_dir, f"mimic_{s}_boxes.zarr"),
            os.path.join(data_dir, f"mimic_{s}_image_size.csv"), n_obj)
        return cls._assemble(data_dir, store, vqa, q_itow, q_wtoi,
                             a_itow, a_wtoi, emb_dim, max_qlen)

    @classmethod
    def _assemble(cls, data_dir, store, vqa, q_itow, q_wtoi, a_itow, a_wtoi,
                  emb_dim, max_qlen, image_id_suffix=""):
        n_answers = len(a_itow) + 1
        table = QuestionTable(vqa, q_wtoi, a_wtoi, n_answers,
                              store.id_to_row, max_qlen,
                              image_id_suffix=image_id_suffix)
        q_words = len(q_itow) + 1
        wemb = load_glove_embeddings(data_dir, q_wtoi, emb_dim, q_words)
        return cls(store, table, q_itow, q_wtoi, a_itow, a_wtoi, wemb, vqa)


def _load_json(path: str):
    with open(path) as f:
        return json.load(f)
