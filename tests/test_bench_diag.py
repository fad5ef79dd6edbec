"""bench.py variance self-diagnosis (VERDICT round 3 item 3).

Pure-host unit tests of the window classifier — the on-chip numbers it
explains are produced by the driver's bench run; here we pin the
attribution logic on synthetic window stats.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _window_stats, classify_windows  # noqa: E402


def _w(total, enqueue=None, stall=0.0, rtt=20.0, med=6.0):
    enqueue = total if enqueue is None else enqueue
    return {"total_s": total, "enqueue_s": enqueue,
            "drain_s": round(total - enqueue, 3), "median_step_ms": med,
            "n_stalls": int(stall > 0), "stall_s": stall, "rtt_ms": rtt}


def test_unimodal():
    occ, diag = classify_windows([_w(0.60), _w(0.61), _w(0.62)])
    assert occ == 1.0
    assert "unimodal" in diag


def test_enqueue_uniform_slowdown():
    stats = [_w(0.60), _w(0.60), _w(0.72, med=7.2), _w(0.73, med=7.3)]
    occ, diag = classify_windows(stats)
    assert occ == 0.5
    assert "enqueue-side" in diag
    assert "uniform per-step slowdown" in diag


def test_enqueue_bursty_stalls():
    stats = [_w(0.60), _w(0.75, stall=0.13)]
    occ, diag = classify_windows(stats)
    assert "bursty step stalls" in diag


def test_drain_side():
    stats = [_w(0.60, enqueue=0.55), _w(0.80, enqueue=0.56)]
    occ, diag = classify_windows(stats)
    assert "drain-side" in diag


def test_tunnel_rtt_flagged():
    stats = [_w(0.60, rtt=20.0), _w(0.75, rtt=55.0, med=7.5)]
    occ, diag = classify_windows(stats)
    assert "tunnel RTT" in diag and "2.8x" in diag


def test_window_stats_stall_detection():
    # 20 steps of ~6 ms with two 30 ms stalls
    steps = [0.006] * 18 + [0.030, 0.031]
    s = _window_stats(steps, enqueue_s=sum(steps), drain_s=0.02,
                      rtt_ms=20.0)
    assert s["n_stalls"] == 2
    assert 0.045 < s["stall_s"] < 0.052
    assert s["median_step_ms"] == 6.0


def test_device_probe_flat_names_tunnel():
    """Flat on-device step time across a bimodal run -> the slow mode
    is tunnel-side completion (VERDICT r4 item 3)."""
    fast = dict(_w(0.60, enqueue=0.55), device_step_ms=9.30)
    slow = dict(_w(0.80, enqueue=0.56), device_step_ms=9.35)
    occ, diag = classify_windows([fast, slow])
    assert "device-flat" in diag and "tunnel-side" in diag


def test_device_probe_grown_names_device():
    fast = dict(_w(0.60, enqueue=0.55), device_step_ms=9.30)
    slow = dict(_w(0.80, enqueue=0.56), device_step_ms=11.90)
    occ, diag = classify_windows([fast, slow])
    assert "device-side" in diag and "1.28x" in diag


def test_window_stats_device_field():
    s = _window_stats([0.006] * 4, enqueue_s=0.024, drain_s=0.01,
                      rtt_ms=20.0, device_step_ms=9.314)
    assert s["device_step_ms"] == 9.31
    s2 = _window_stats([0.006] * 4, enqueue_s=0.024, drain_s=0.01,
                       rtt_ms=20.0)
    assert "device_step_ms" not in s2
