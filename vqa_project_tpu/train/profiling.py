"""Tracing / profiling hooks.

The reference has no profiler (SURVEY.md section 5: tqdm + prints only).
This module provides the TPU-native observability surface:

- trace(): context manager around jax.profiler.trace emitting a
  TensorBoard-loadable trace directory;
- StepTimer: wall-clock step timing with warmup exclusion and percentile
  summary. On the axon-tunneled dev chip, jax.block_until_ready does not
  track real completion, so the timer forces a tiny value fetch at
  measurement boundaries;
- annotate(): TraceAnnotation wrapper for named regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code region (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def force_sync(x) -> None:
    """Barrier that is honest on tunneled backends: fetches ONE element
    (block_until_ready does not track real completion there, and pulling
    a whole leaf would add a multi-MB D2H per call)."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "ravel"):
        leaf = leaf.ravel()[:1]  # device-side slice, then 4-byte fetch
    jax.device_get(leaf)


class StepTimer:
    """Accumulates per-step wall times; reports throughput percentiles."""

    def __init__(self, warmup: int = 3, batch_size: int = 0,
                 n_chips: int = 1):
        self.warmup = warmup
        self.batch_size = batch_size
        self.n_chips = max(1, n_chips)
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        out = {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
        }
        if self.batch_size:
            out["qa_pairs_per_sec_per_chip"] = float(
                self.batch_size / t.mean() / self.n_chips)
        return out
