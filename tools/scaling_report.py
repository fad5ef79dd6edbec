"""SPMD scaling report: what collectives does the sharded step emit?

AOT-compiles the REAL train step over a virtual N-device mesh (CPU,
same GSPMD partitioner as TPU) at real VQA v2 dimensions, walks the
optimized HLO for collectives (all-reduce / all-gather /
reduce-scatter / collective-permute), sums their bytes, and models the
per-step ICI time on a v5e 2-D torus — the scaling-book style check
that data parallelism's gradient all-reduce rides ICI comfortably
ahead of the compute it overlaps.

The reference is single-GPU (SURVEY.md "Parallelism" — no DP/TP/PP
anywhere; nn.DataParallel only as commented-out code, run.py:387-390),
so this report covers capability the TPU build ADDS.

Usage:
    python tools/scaling_report.py [--devices 8] [--tp 1] [--bsize 256]
    # writes one JSON line to stdout; human table to stderr
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# v5e ICI: 2-D torus, ~45 GB/s per link per direction (public "How to
# Scale Your Model" numbers); a ring all-reduce on one torus axis moves
# 2*(N-1)/N * bytes per chip over that axis's 2 links.
ICI_BW_PER_LINK = 45e9
V5E_STEP_MS = 6.11      # measured busy/step, bs 256, round 3


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "s64": 8, "u64": 8}


def tensor_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape literal like 'f32[2052,2048]{1,0}'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collect(hlo: str):
    """Sum collective-op bytes by kind from optimized HLO text."""
    out = {}
    pat = re.compile(
        r"=\s*((?:\([^)]*\)|[\w\[\]{},:() ]+?))\s*"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?\(")
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        shape_part, kind = m.groups()
        if line.lstrip().startswith("ROOT"):
            pass
        # tuple shapes: sum each element
        shapes = re.findall(r"\w+\[[\d,]*\][^,)]*", shape_part)
        nbytes = sum(tensor_bytes(s) for s in shapes)
        k = out.setdefault(kind, [0, 0])
        k[0] += 1
        k[1] += nbytes
    return {kind: {"count": c, "bytes": b} for kind, (c, b) in out.items()}


_MLIR_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "i32": 4,
                     "ui32": 4, "i16": 2, "i8": 1, "ui8": 1, "i1": 1,
                     "i64": 8}


def collect_stablehlo(txt: str):
    """Sum all_reduce bytes by element dtype from StableHLO text.

    The PROGRAM-requested collective dtypes: the CPU backend's pipeline
    promotes bf16 all-reduces to f32 accumulation (keeping the bf16
    rounding — verified on the optimized HLO), so the optimized-HLO
    count under-reports what a bf16 gradient reduction saves on TPU,
    where bf16 all-reduce is native. shard_map psums appear verbatim at
    this level; the inferred-sharding path has none here (GSPMD adds
    its all-reduces during partitioning)."""
    out = {}
    lines = txt.splitlines()
    for i, ln in enumerate(lines):
        if "stablehlo.all_reduce" not in ln or "=" not in ln:
            continue
        # result types live on the `}) : (...) -> ...` closing line
        for j in range(i, min(i + 80, len(lines))):
            m = re.search(r"\}\)?\s*:\s*\([^)]*\)\s*->\s*(.+)$", lines[j])
            if m:
                for t in re.findall(r"tensor<([^>]+)>", m.group(1)):
                    parts = t.split("x")
                    dt = parts[-1]
                    n = 1
                    for d in parts[:-1]:
                        n *= int(d)
                    nbytes = n * _MLIR_DTYPE_BYTES.get(dt, 4)
                    k = out.setdefault(dt, [0, 0])
                    k[0] += 1
                    k[1] += nbytes
                break
    return {dt: {"count": c, "bytes": b} for dt, (c, b) in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--bsize", type=int, default=256)
    ap.add_argument("--grad_reduce_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.models import GraphVQAModel
    from vqa_project_tpu.parallel import make_mesh, replicate, shard_batch
    from vqa_project_tpu.train.state import create_train_state, \
        make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    # real VQA v2 dimensions (torch_dataset.py:40: K=36, 2048-d features,
    # 3000+1 answers, GloVe-300 vocab)
    cfg = ModelConfig(vocab_size=13001, emb_dim=300, feat_dim=2052,
                      hid_dim=1024, out_dim=3001, combined_dim=512,
                      n_kernels=8, neighbourhood_size=16, n_obj=36,
                      max_qlen=16, compute_dtype="bfloat16",
                      use_pallas=False)  # XLA path: AOT on CPU
    tcfg = TrainConfig(batch_size=args.bsize, tp=args.tp)

    if args.tp > 1:
        from vqa_project_tpu.parallel import make_mesh_2d, shard_state

        mesh = make_mesh_2d(args.tp, args.devices)
    else:
        mesh = make_mesh(args.devices)

    model = GraphVQAModel(cfg=cfg)
    rng = np.random.default_rng(0)
    b = args.bsize
    batch = {
        "question": rng.integers(
            1, cfg.vocab_size, (b, cfg.max_qlen)).astype(np.int32),
        "image": rng.normal(size=(b, cfg.n_obj, cfg.feat_dim)
                            ).astype(np.float32),
        "qlen": rng.integers(3, cfg.max_qlen + 1, (b,)).astype(np.int32),
        "answers": np.abs(rng.normal(size=(b, cfg.out_dim))
                          ).astype(np.float32),
        "votes": np.ones((b, cfg.out_dim), np.float32),
        "mask": np.ones((b,), np.float32),
    }
    tx = make_optimizer(tcfg, 10)
    state = create_train_state(model, cfg, tx, batch, seed=0)
    if args.tp > 1:
        state = shard_state(state, mesh)
    else:
        state = replicate(state, mesh)
    step = build_train_step(model, tx, mesh,
                            grad_reduce_dtype=args.grad_reduce_dtype)
    sharded = shard_batch(batch, mesh)

    # host-mode step: cache_arrays is () — lower the jitted step directly
    lowered = step.jit_step.lower(state, sharded, ())
    requested = collect_stablehlo(lowered.as_text())
    compiled = lowered.compile()
    hlo = compiled.as_text()
    stats = collect(hlo)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    total_bytes = sum(v["bytes"] for v in stats.values())
    requested_bytes = sum(v["bytes"] for v in requested.values())
    if requested and requested_bytes < total_bytes:
        # explicit shard_map psums whose dtype the CPU pipeline widened
        # (bf16 all-reduce -> f32 accumulate); TPU executes the
        # requested dtype natively, so IT is the honest ICI number
        total_bytes = requested_bytes
    # per-chip ring all-reduce cost over one torus axis (2 links/dir):
    n = args.devices
    ici_s = (2 * (n - 1) / n) * total_bytes / (2 * ICI_BW_PER_LINK)
    report = {
        "devices": n,
        "tp": args.tp,
        "grad_reduce_dtype": args.grad_reduce_dtype,
        "collectives_requested_stablehlo": requested,
        "batch_per_chip": args.bsize // (n // args.tp) if args.tp > 1
        else args.bsize // n,
        "n_params": n_params,
        "collectives": stats,
        "collective_bytes_per_step": total_bytes,
        "ici_ms_estimate": round(ici_s * 1e3, 3),
        "compute_ms_measured_1chip": V5E_STEP_MS,
        "ici_fraction_pct": round(100 * ici_s * 1e3 / V5E_STEP_MS, 2),
    }
    for kind, v in stats.items():
        print(f"{kind:20s} x{v['count']:4d}  {v['bytes'] / 1e6:10.2f} MB",
              file=sys.stderr)
    print(f"{'TOTAL':20s}        {total_bytes / 1e6:10.2f} MB  "
          f"-> ~{ici_s * 1e3:.2f} ms on v5e ICI "
          f"({report['ici_fraction_pct']}% of the measured "
          f"{V5E_STEP_MS} ms step)", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
