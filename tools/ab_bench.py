"""Interleaved A/B bench driver for the tunneled chip.

The axon-tunneled chip drifts 20-30%/hour and the remote compile
service is bimodal, so back-to-back batches of A then B lie. This
driver alternates A,B,A,B,... in fresh processes (persistent compile
cache makes warm starts cheap), parses bench.py's one-line JSON, and
reports per-arm medians plus the pairwise ratio distribution — the
pairwise ratios are drift-immune.

Usage:
    python tools/ab_bench.py --pairs 3 --arm-a "" \
        --arm-b "VQAX_GRU_BWD=carry" [-- extra env for both arms]

Each --arm-* value is a space-separated list of KEY=VALUE overrides.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_env(spec: str) -> dict:
    env = {}
    for tok in spec.split():
        k, _, v = tok.partition("=")
        env[k] = v
    return env


def run_arm(env_spec: str, common: dict, timeout: int) -> float:
    env = dict(os.environ)
    env.update(common)
    env.update(_parse_env(env_spec))
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed: {proc.stderr[-1500:]}")
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--arm-a", default="", help="env overrides for arm A")
    ap.add_argument("--arm-b", required=True, help="env overrides for arm B")
    ap.add_argument("--common", default="BENCH_SMALL=0",
                    help="env overrides for both arms")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    common = _parse_env(args.common)

    a_vals, b_vals, ratios = [], [], []
    for i in range(args.pairs):
        a = run_arm(args.arm_a, common, args.timeout)
        print(f"pair {i}: A={a:.1f}", flush=True)
        b = run_arm(args.arm_b, common, args.timeout)
        print(f"pair {i}: B={b:.1f}  B/A={b / a:.4f}", flush=True)
        a_vals.append(a)
        b_vals.append(b)
        ratios.append(b / a)
    print(json.dumps({
        "arm_a": args.arm_a, "arm_b": args.arm_b,
        "a_median": statistics.median(a_vals),
        "b_median": statistics.median(b_vals),
        "ratio_median": statistics.median(ratios),
        "ratios": [round(r, 4) for r in ratios],
    }))


if __name__ == "__main__":
    main()
