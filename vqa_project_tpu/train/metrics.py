"""Structured metrics logging: stdout + JSONL + throughput meters.

Replaces the reference's print/tqdm-only observability
(/root/reference/run.py:224-231,444-445) with a structured logger that
also reports steps/sec and QA-pairs/sec/chip — the BASELINE.json headline
metric.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


def _is_primary() -> bool:
    """Process-0 check without importing jax at module import time (the
    logger is also used in host-only tool scripts)."""
    try:
        from vqa_project_tpu.parallel.multihost import is_primary

        return is_primary()
    except Exception:
        return True


class MetricLogger:
    def __init__(self, log_interval: int = 40, jsonl_path: Optional[str] = None,
                 n_chips: int = 1, batch_size: int = 0):
        self.log_interval = max(1, log_interval)
        self.jsonl_path = jsonl_path
        self.n_chips = max(1, n_chips)
        self.batch_size = batch_size
        self._f = None
        if jsonl_path and _is_primary():  # rank-0-only file writes
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
            self._f = open(jsonl_path, "a")
        self.reset_window()

    def reset_window(self):
        self._loss = 0.0
        self._score = 0.0
        self._count = 0
        self._examples = 0.0
        self._t0 = time.perf_counter()

    def update(self, *, epoch: int, step: int, loss: float, score: float,
               lr: Optional[float] = None):
        self._loss += loss
        self._score += score
        self._count += 1
        self._examples += self.batch_size
        if self._count % self.log_interval:
            return
        self._flush(epoch, step, lr)

    def log_window(self, *, epoch: int, step: int, loss_sum: float,
                   score_sum: float, n: int,
                   examples: Optional[float] = None,
                   lr: Optional[float] = None):
        """Record a pre-aggregated window of n steps (single D2H fetch).
        examples: valid sample count (defaults to n * batch_size)."""
        self._loss += loss_sum
        self._score += score_sum
        self._count += n
        self._examples += (examples if examples is not None
                           else n * self.batch_size)
        self._flush(epoch, step, lr)

    def _flush(self, epoch: int, step: int, lr: Optional[float] = None):
        dt = time.perf_counter() - self._t0
        steps_per_sec = self._count / max(dt, 1e-9)
        qa_per_sec = steps_per_sec * self.batch_size
        rec = {
            "epoch": epoch,
            "step": step,
            "loss": self._loss / self._count,
            "vqa_acc": 100.0 * self._score / max(1.0, self._examples),
            "steps_per_sec": round(steps_per_sec, 3),
            "qa_pairs_per_sec_per_chip": round(qa_per_sec / self.n_chips, 2),
        }
        if lr is not None:
            rec["lr"] = lr
        # reference-style line (run.py:226-228) + structured payload
        print(
            "Epoch %02d(%05d), ave loss: %.7f, ave accuracy: %.2f%% "
            "[%.1f qa/s/chip]" % (
                epoch + 1, step, rec["loss"], rec["vqa_acc"],
                rec["qa_pairs_per_sec_per_chip"]), flush=True)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        self.reset_window()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
