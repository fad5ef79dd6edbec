#!/usr/bin/env python
"""Flag when the Pallas kernels changed after their last on-chip pass.

The gated hardware tests (tests/test_dropout_onchip.py,
tests/test_kernels_onchip.py) validate behavior interpret mode cannot
execute (TPU PRNG dropout, Mosaic MXU dot precision). Their evidence
goes stale the moment ops/pallas/*.py changes (VERDICT round 3 item 2),
so this tool pins a content-hash record of the kernel sources at the
time of the last on-chip pass and fails when they diverge.

    python tools/check_onchip_stale.py            # verify (exit 1 = stale)
    python tools/check_onchip_stale.py --record   # after an on-chip pass

tests/test_robustness.py runs the verify mode in the regular CPU suite,
so a kernel edit without a re-validation turns the suite red.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "tests", "onchip_validation.json")
WATCHED = ["vqa_project_tpu/ops/pallas/*.py",
           "tests/test_dropout_onchip.py",
           "tests/test_kernels_onchip.py"]


def current_hashes() -> dict:
    out = {}
    for pat in WATCHED:
        for path in sorted(glob.glob(os.path.join(REPO, pat))):
            rel = os.path.relpath(path, REPO)
            with open(path, "rb") as f:
                out[rel] = hashlib.sha256(f.read()).hexdigest()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="write the record for the current sources "
                         "(run ONLY right after the gated on-chip tests "
                         "passed on real TPU)")
    args = ap.parse_args()
    if args.record:
        try:
            commit = subprocess.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True
            ).stdout.strip()
        except Exception:
            commit = "unknown"
        rec = {"commit": commit, "date": date.today().isoformat(),
               "command": "VQAX_TEST_TPU=1 python -m pytest "
                          "tests/test_dropout_onchip.py "
                          "tests/test_kernels_onchip.py -q",
               "sha256": current_hashes()}
        with open(RECORD, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"recorded on-chip validation at {commit} ({rec['date']})")
        return 0
    if not os.path.exists(RECORD):
        print("no on-chip validation record: run the gated tests on TPU "
              "then `python tools/check_onchip_stale.py --record`",
              file=sys.stderr)
        return 1
    with open(RECORD) as f:
        rec = json.load(f)
    cur = current_hashes()  # one snapshot for both checks
    stale = [p for p, h in cur.items() if rec["sha256"].get(p) != h]
    missing = [p for p in rec["sha256"] if p not in cur]
    if stale or missing:
        print("ON-CHIP VALIDATION STALE (recorded at "
              f"{rec['commit']}, {rec['date']}): changed/removed since "
              f"the last hardware pass: {stale + missing}\n"
              f"re-run: {rec['command']}\nthen: python "
              "tools/check_onchip_stale.py --record", file=sys.stderr)
        return 1
    print(f"on-chip validation current ({rec['commit']}, {rec['date']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
