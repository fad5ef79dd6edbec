"""GloVe embedding matrix with a packed .npy cache.

Parity target: VQA_Dataset.init_pretrained_wemb
(/root/reference/torch_dataset.py:79-100) — rows of a (q_words, emb_dim)
matrix filled from glove.6B.<d>d.txt for every vocab word present, zeros
otherwise.

The reference re-parses the 400k-line text file (~30 s) on every dataset
construction; that is a pure input-pipeline stall on an 8-chip mesh
(SURVEY.md "Data stall risk"). Here the per-vocab matrix is cached as
.npy keyed by a hash of (glove file size/mtime, vocab), so every run after
the first is a single mmap read.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import numpy as np


def _cache_key(glove_path: str, wtoi: Dict[str, int], emb_dim: int) -> str:
    st = os.stat(glove_path)
    h = hashlib.sha1()
    h.update(f"{glove_path}:{st.st_size}:{int(st.st_mtime)}:{emb_dim}".encode())
    for w, i in sorted(wtoi.items(), key=lambda kv: kv[1]):
        h.update(w.encode("utf-8", "replace"))
        h.update(str(i).encode())
    return h.hexdigest()[:16]


def load_glove_embeddings(
    data_dir: str,
    wtoi: Dict[str, int],
    emb_dim: int = 300,
    vocab_size: int = 0,
    cache_dir: str = None,
) -> np.ndarray:
    """Build (vocab_size, emb_dim) float32 matrix from GloVe text.

    vocab_size defaults to max(wtoi.values()) + 1 (the reference's
    q_words = len(itow) + 1 since indices are 1-based).
    """
    if vocab_size <= 0:
        vocab_size = (max(wtoi.values()) + 1) if wtoi else 1
    glove_path = os.path.join(data_dir, f"glove.6B.{emb_dim}d.txt")

    cache_dir = cache_dir or os.path.join(data_dir, "_tpu_cache")
    if os.path.exists(glove_path):
        os.makedirs(cache_dir, exist_ok=True)
        key = _cache_key(glove_path, wtoi, emb_dim)
        cache = os.path.join(cache_dir, f"glove_{key}_{vocab_size}.npy")
        if os.path.exists(cache):
            return np.load(cache)

        wanted = set(wtoi.keys())
        mat = np.zeros((vocab_size, emb_dim), dtype=np.float32)
        with open(glove_path, "r", encoding="utf-8") as f:
            for line in f:
                sp = line.rstrip().split(" ")
                w = sp[0]
                if w in wanted:
                    mat[wtoi[w]] = np.asarray(sp[1:], dtype=np.float32)
        np.save(cache, mat)
        return mat

    # No GloVe file (synthetic/test runs): deterministic random rows so the
    # embedding is still non-degenerate.
    rng = np.random.default_rng(1000)
    return (rng.standard_normal((vocab_size, emb_dim)) * 0.1).astype(
        np.float32)
