"""The day-1 readiness dry run (tools/day1_dryrun.py) stays green.

RUNBOOK.md's claim is "every stage dry-run-tested at HEAD"; this keeps
that true in CI. Slow tier: it subprocess-drives the real CLIs
(preprocess -> train -> eval -> torch round-trip), ~3 min on CPU.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_day1_dryrun_all_stages(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "day1_dryrun.py"),
         "--work", str(tmp_path / "work")],
        cwd=REPO, capture_output=True, text=True, timeout=580)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ALL STAGES PASSED" in r.stdout
