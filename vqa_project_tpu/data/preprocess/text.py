"""VQA v2 text preprocessing: combine QA, tokenize, build vocabularies,
compute soft answer scores.

Parity target: /root/reference/data/preprocess_text.py. Produces the
same artifacts: vqa_{phase}_combined.json, vqa_{phase}_toked.json,
{phase}_q_dict.p (1-indexed), {phase}_a_dict.p (0-indexed, top-n),
vqa_{phase}_final_{n}.json with per-question
answers_w_scores = [(answer, votes/accepted_votes)].

Tokenization uses spacy's blank-vocab Tokenizer when spacy is installed
(the reference's exact construction, preprocess_text.py:32-33); otherwise
a plain whitespace split, which is what the blank tokenizer does on these
inputs. The reference's '?' handling is replicated exactly — see
tokenize() below.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
from typing import List

from vqa_project_tpu.data.vocab import (
    build_answer_vocab,
    build_question_vocab,
    save_vocab,
)

try:
    import spacy
    from spacy.tokenizer import Tokenizer

    _NLP = spacy.load("en_core_web_sm")
    _TOKENIZER = Tokenizer(_NLP.vocab)
except Exception:  # pragma: no cover - spacy not in this image
    _TOKENIZER = None


def tokenize(text: str) -> List[str]:
    """Exact reference tokenization (preprocess_text.py:106-107): a blank
    spacy Tokenizer(vocab) splits on whitespace only, then any token
    containing '?' loses its LAST character — so a standalone '?' becomes
    an empty-string token that enters the question vocab and counts
    toward qlen. Replicated bug-for-bug: regenerated artifacts must match
    reference-produced ones (qlen indexes the GRU's final hidden state,
    so a one-token divergence breaks checkpoint parity). The no-spacy
    fallback is a plain whitespace split, which is what the blank spacy
    tokenizer does for these inputs."""
    text = text.lower()
    if _TOKENIZER is not None:
        toks = [t.text for t in _TOKENIZER(text)]
    else:
        toks = text.split()
    return [t[:-1] if "?" in t else t for t in toks]


def combine_qa(questions: dict, annotations: List[dict],
               phase: str, out_dir: str = ".") -> List[dict]:
    """Join the VQA v2 questions json with its annotations json
    (qid-aligned, preprocess_text.py:113-135)."""
    data = []
    for i, q in enumerate(questions["questions"]):
        ann = annotations[i]
        assert q["question_id"] == ann["question_id"]
        answers = [a["answer"] for a in ann["answers"]]
        data.append({
            "question": q["question"],
            "question_id": q["question_id"],
            "image_id": str(q["image_id"]),
            "answer": ann["multiple_choice_answer"],
            "answers": collections.Counter(answers).most_common(),
        })
    _dump(data, os.path.join(out_dir, f"vqa_{phase}_combined.json"))
    return data


def tokenize_questions(rows: List[dict], phase: str,
                       out_dir: str = ".") -> List[dict]:
    for row in rows:
        row["question_toked"] = tokenize(row["question"])
    _dump(rows, os.path.join(out_dir, f"vqa_{phase}_toked.json"))
    return rows


def process_questions(rows: List[dict], phase: str, out_dir: str = "."):
    itow, wtoi = build_question_vocab(r["question_toked"] for r in rows)
    save_vocab(os.path.join(out_dir, f"{phase}_q_dict.p"), itow, wtoi)
    return itow, wtoi


def process_answers(rows: List[dict], phase: str, n_answers: int = 3000,
                    out_dir: str = "."):
    """Top-n answer vocab + per-question normalized answer scores
    (preprocess_text.py:37-65)."""
    itow, wtoi = build_answer_vocab((r["answer"] for r in rows), n_answers)
    save_vocab(os.path.join(out_dir, f"{phase}_a_dict.p"), itow, wtoi)

    vocab = set(wtoi)
    for row in rows:
        accepted = sum(c for w, c in row["answers"] if w in vocab)
        row["answers_w_scores"] = [
            (w, c / accepted) for w, c in row["answers"] if w in vocab
        ] if accepted else []
    _dump(rows, os.path.join(out_dir, f"vqa_{phase}_final_{n_answers}.json"))
    return rows


def run_phase(phase: str, raw_dir: str = "raw", out_dir: str = ".",
              n_answers: int = 3000):
    """Full pipeline for one phase (preprocess_text.py main)."""
    if phase != "test":
        questions = _load(os.path.join(
            raw_dir, f"v2_OpenEnded_mscoco_{phase}2014_questions.json"))
        annotations = _load(os.path.join(
            raw_dir, f"v2_mscoco_{phase}2014_annotations.json"))
        rows = combine_qa(questions, annotations["annotations"],
                          phase, out_dir)
        rows = tokenize_questions(rows, phase, out_dir)
        if phase == "train":
            process_questions(rows, phase, out_dir)
        process_answers(rows, phase, n_answers, out_dir)
    else:
        questions = _load(os.path.join(
            raw_dir, "v2_OpenEnded_mscoco_test2015_questions.json"))
        rows = [{"question": q["question"],
                 "question_id": q["question_id"],
                 "image_id": str(q["image_id"])}
                for q in questions["questions"]]
        tokenize_questions(rows, phase, out_dir)


def _load(path):
    with open(path) as f:
        return json.load(f)


def _dump(obj, path):
    with open(path, "w") as f:
        json.dump(obj, f)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Preprocessing for VQA v2 text data (TPU-native)")
    p.add_argument("--data", nargs="+", default=["train", "test"])
    p.add_argument("--nanswers", type=int, default=3000)
    p.add_argument("--raw_dir", type=str, default="raw")
    p.add_argument("--out_dir", type=str, default=".")
    args, unparsed = p.parse_known_args(argv)
    if unparsed:
        raise SystemExit(f"Unknown argument: {unparsed}")
    for phase in args.data:
        print(f"processing {phase} data")
        run_phase(phase, args.raw_dir, args.out_dir, args.nanswers)
    print("Done")


if __name__ == "__main__":
    main()
