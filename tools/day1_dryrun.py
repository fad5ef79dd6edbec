#!/usr/bin/env python
"""Day-1 readiness dry run: execute every RUNBOOK.md stage end-to-end.

Runs the EXACT command sequence of the real-data runbook (RUNBOOK.md)
against the committed official-format fixture
(tests/fixtures/vqa2_real_format/ — official VQA v2 question/annotation
json schemas and one genuine-format bottom-up-attention TSV line), so
the 60 GB run can start the hour the data becomes reachable with every
stage already proven against the official byte formats:

  stage 1  text preprocess     (python -m ...preprocess.text)
  stage 2  image preprocess    (python -m ...preprocess.image_features)
  stage 3  ingest + pack       (GraphVQADataset.vqa2 invariants)
  stage 4  train               (python run.py --train)
  stage 5  eval -> result.json (python run.py --eval, EvalAI schema)
  stage 6  torch round-trip    (export -> .pt -> import, bit-exact) —
           the machinery behind the day-1 smoke test (adjacency parity
           of the released reference checkpoint, models/torch_import.py)

Each stage prints the artifacts it produced (name, size). Any failure
is a hard exit — a clean run means the runbook's commands are live at
HEAD. Stage 0 (download) is network-gated and exercised only as far as
the offline environment allows (resumable-fetch logic is unit-level;
URLs are pinned in data/preprocess/download.py).

Usage: python tools/day1_dryrun.py [--work DIR] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "vqa2_real_format")


def banner(stage: str) -> None:
    print(f"\n=== {stage} " + "=" * max(0, 64 - len(stage)), flush=True)


def manifest(root: str, names) -> None:
    for n in sorted(names):
        p = os.path.join(root, n)
        if os.path.isdir(p):
            sz = sum(os.path.getsize(os.path.join(dp, f))
                     for dp, _, fs in os.walk(p) for f in fs)
            print(f"  {n + '/':48s} {sz:>12,} B")
        elif os.path.exists(p):
            print(f"  {n:48s} {os.path.getsize(p):>12,} B")
        else:
            sys.exit(f"FAIL: expected artifact missing: {n}")


def run(cmd, **kw) -> None:
    print("  $", " ".join(cmd), flush=True)
    # always CPU, single device: the dry run validates pipeline
    # plumbing; the session env's tunneled-TPU JAX_PLATFORMS value does
    # not resolve in child processes, and an inherited
    # xla_force_host_platform_device_count (tests/conftest.py sets 8)
    # would make the tiny bsize-4 commands fail the divisibility check
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
    env.pop("XLA_FLAGS", None)
    kw.setdefault("cwd", REPO)
    r = subprocess.run(cmd, env=env, **kw)
    if r.returncode:
        sys.exit(f"FAIL: {' '.join(cmd)} -> exit {r.returncode}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default=None, help="artifact dir "
                    "(default: a fresh temp dir)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir on success")
    args = ap.parse_args()
    work = args.work or tempfile.mkdtemp(prefix="vqa_day1_")
    os.makedirs(work, exist_ok=True)
    save = os.path.join(work, "save")

    banner("stage 0: raw inputs (official formats, committed fixture)")
    manifest(FIXTURE, [
        "v2_OpenEnded_mscoco_train2014_questions.json",
        "v2_mscoco_train2014_annotations.json",
        "trainval_resnet101_faster_rcnn_genome_36.tsv",
    ])

    banner("stage 1: text preprocess (RUNBOOK step 2)")
    run([sys.executable, "-m", "vqa_project_tpu.data.preprocess.text",
         "--data", "train", "--raw_dir", FIXTURE, "--out_dir", work])
    manifest(work, ["vqa_train_combined.json", "vqa_train_toked.json",
                    "vqa_train_final_3000.json", "train_q_dict.p",
                    "train_a_dict.p"])
    # the fixture carries one split; alias it as val so the standard
    # train/eval commands below run unmodified (dry-run-only shim)
    shutil.copy(os.path.join(work, "vqa_train_final_3000.json"),
                os.path.join(work, "vqa_val_final_3000.json"))

    banner("stage 2: image preprocess (RUNBOOK step 3)")
    # lay the fixture out exactly as the downloader does (<raw>/
    # trainval_36/<published name>) and run the REAL CLI command from
    # the RUNBOOK — a bypass via infiles= once masked a broken default
    # TSV path in the documented command
    raw = os.path.join(work, "raw", "trainval_36")
    os.makedirs(raw, exist_ok=True)
    shutil.copy(os.path.join(
        FIXTURE, "trainval_resnet101_faster_rcnn_genome_36.tsv"), raw)
    run([sys.executable, "-m",
         "vqa_project_tpu.data.preprocess.image_features",
         "--data", "trainval", "--raw_dir", os.path.join(work, "raw"),
         "--out_dir", work])
    manifest(work, ["trainval.zarr", "trainval_boxes.zarr",
                    "trainval_image_size.csv"])

    banner("stage 3: ingest + memmap pack invariants")
    run([sys.executable, "-c", f"""
from vqa_project_tpu.data import GraphVQADataset
ds = GraphVQADataset.vqa2({work!r}, 'train', n_obj=36, max_qlen=16)
assert ds.n_questions == 4, ds.n_questions
assert ds.store.features.shape[1:] == (36, 2048)
# real data: n_answers == 3001 (top-3000 vocab + 1); the fixture's
# 4 questions build a smaller vocab, so only check it's live
assert ds.n_answers > 1
print(f'  pack ok: {{ds.n_questions}} questions, '
      f'features {{ds.store.features.shape}}, '
      f'{{ds.n_answers}} answers')
"""])

    banner("stage 4: train (RUNBOOK step 4)")
    run([sys.executable, "run.py", "--train", "--data_dir", work,
         "--save_dir", save, "--name", "day1", "--ep", "2",
         "--bsize", "4", "--hid", "64", "--n_kernels", "4",
         "--neighbourhood_size", "8", "--compute_dtype", "float32",
         "--no_pallas"])
    manifest(save, ["day1_2.ckpt"])

    banner("stage 5: eval -> result.json (RUNBOOK step 5)")
    result = os.path.join(work, "result.json")
    # run.py --eval writes result.json into the CWD (reference parity)
    # — run it with cwd=work so the dry run cannot clobber a REAL
    # result.json sitting in the repo root from an actual RUNBOOK run
    run([sys.executable, os.path.join(REPO, "run.py"), "--eval",
         "--data_dir", work,
         "--save_dir", work, "--model_path",
         os.path.join(save, "day1_2.ckpt"), "--bsize", "4",
         "--hid", "64", "--n_kernels", "4", "--neighbourhood_size", "8",
         "--compute_dtype", "float32", "--no_pallas"],
        cwd=work)
    # validate the EvalAI schema (run.py:100-113)
    rows = json.load(open(result))
    assert rows and all(set(r) == {"question_id", "answer"} for r in rows)
    print(f"  result.json: {len(rows)} rows, EvalAI schema ok")

    banner("stage 6: torch checkpoint round-trip (day-1 smoke machinery)")
    run([sys.executable, "-c", f"""
import numpy as np
from vqa_project_tpu.train.state import load_checkpoint
from vqa_project_tpu.models.torch_import import (
    save_torch_checkpoint, load_torch_checkpoint)
payload, _ = load_checkpoint({os.path.join(save, 'day1_2.ckpt')!r})
params = payload['params']
pt = {os.path.join(work, 'day1_export.pt')!r}
save_torch_checkpoint(pt, params)
back = load_torch_checkpoint(pt)['params']
flat = lambda t, pre='': (
    [(pre + k, v) for k, d in sorted(t.items())
     for k, v in flat(d, k + '.')] if isinstance(t, dict)
    else [(pre[:-1], t)])
# both trees at the 'params'-collection level (export accepts either)
a = dict(flat(params.get('params', params)))
b = dict(flat(back))
assert a.keys() == b.keys(), set(a) ^ set(b)
for k in a:
    np.testing.assert_array_equal(np.asarray(a[k], np.float32), b[k])
print(f'  round-trip bit-exact across {{len(a)}} parameter leaves')
"""])

    print(f"\nALL STAGES PASSED — runbook commands live at HEAD "
          f"(work dir: {work})")
    if not args.keep and args.work is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
