"""Question/answer vocabulary IO.

Parity target: the pickle vocab files of the reference
(/root/reference/data/preprocess_text.py:50,100 — {'itow': {...},
'wtoi': {...}} dicts; questions 1-indexed, answers 0-indexed).
"""

from __future__ import annotations

import pickle
from typing import Dict, Tuple


def load_vocab(path: str) -> Tuple[Dict[int, str], Dict[str, int]]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["itow"], d["wtoi"]


def save_vocab(path: str, itow: Dict[int, str], wtoi: Dict[str, int]) -> None:
    with open(path, "wb") as f:
        pickle.dump({"itow": itow, "wtoi": wtoi}, f)


def build_question_vocab(token_lists) -> Tuple[Dict[int, str], Dict[str, int]]:
    """1-indexed question vocab over all tokens (preprocess_text.py:68-100;
    index 0 is the pad/unknown id)."""
    counts: Dict[str, int] = {}
    for toks in token_lists:
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
    vocab = list(counts.keys())
    itow = {i + 1: w for i, w in enumerate(vocab)}
    wtoi = {w: i + 1 for i, w in enumerate(vocab)}
    return itow, wtoi


def build_answer_vocab(answers, n_answers: int = 3000):
    """0-indexed top-n answer vocab (preprocess_text.py:37-50)."""
    counts: Dict[str, int] = {}
    for a in answers:
        counts[a] = counts.get(a, 0) + 1
    ranked = sorted(((c, w) for w, c in counts.items()), reverse=True)
    vocab = [w for _, w in ranked[:n_answers]]
    itow = {i: w for i, w in enumerate(vocab)}
    wtoi = {w: i for i, w in enumerate(vocab)}
    return itow, wtoi
