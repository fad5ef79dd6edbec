"""On-chip op-level profile of the train step at bench dimensions.

Captures a jax.profiler trace of N steps of the REAL training step
(same setup as bench.py), parses the xplane.pb directly (the
tensorboard_plugin_profile converters are broken in this image), and
prints per-op device time — the tool behind the README's round-3
perf-target list.

Usage:
    python tools/profile_step.py [--bsize 256] [--steps 10] [--top 30]
    python tools/profile_step.py --images 16384   # at-scale table

Reference anchor: the hot loop this profiles replaces
/root/reference/run.py:202-236 (the torch train loop; the reference
ships no profiler — SURVEY.md section 5).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def capture(args) -> str:
    import jax

    from vqa_project_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import Batcher, GraphVQADataset
    from vqa_project_tpu.data.loader import pack_index_batch
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.parallel import make_mesh, replicate, shard_batch
    from vqa_project_tpu.train.loop import build_model, make_feature_cache
    from vqa_project_tpu.train.state import create_train_state, \
        make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    suffix = "" if args.images == 96 else f"_{args.images}"
    data_dir = os.path.join(tempfile.gettempdir(),
                            f"vqa_bench_data{suffix}")
    if not os.path.exists(os.path.join(data_dir, "train_q_dict.p")):
        generate_synthetic_vqa(
            data_dir, n_images=args.images,
            n_questions=max(4 * args.bsize, 4096), n_obj=36,
            feat_dim=2048, q_vocab=13_000, n_answers=3000, seed=7)
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=36, max_qlen=16)
    mcfg = ModelConfig(compute_dtype="bfloat16",
                       use_pallas=(False if args.no_pallas else "auto"))
    tcfg = TrainConfig(
        batch_size=args.bsize,
        adam_mu_dtype=os.environ.get("BENCH_ADAM_MU_DTYPE", "float32"),
        adam_nu_dtype=os.environ.get("BENCH_ADAM_NU_DTYPE", "float32"))
    model = build_model(mcfg, ds)
    mesh = make_mesh()
    cache = make_feature_cache(ds, mesh, tcfg, mcfg.compute_dtype)
    tx = make_optimizer(tcfg, 100)
    sample = next(iter(Batcher(ds, args.bsize)))
    state = create_train_state(model, mcfg, tx, sample, seed=0)
    state = replicate(state, mesh)
    if args.mode == "eval":
        from vqa_project_tpu.train.steps import build_eval_step

        eval_step = build_eval_step(model, mesh, feature_cache=cache,
                                    n_answers=ds.n_answers)
        params = state.params

        def step(st, batch):
            _, score, _ = eval_step(params, batch)
            return st, {"loss": score}
    else:
        step = build_train_step(model, tx, mesh, feature_cache=cache,
                                n_answers=ds.n_answers)
    loader = Batcher(ds, args.bsize, shuffle=True, drop_last=True,
                     materialize=cache is None)
    batch = shard_batch(pack_index_batch(next(iter(loader))), mesh)
    for _ in range(3):
        state, m = step(state, batch)
    _ = float(m["loss"])  # sync (block_until_ready lies over the tunnel)

    logdir = args.logdir
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, m = step(state, batch)
        _ = float(m["loss"])
    xp = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    assert xp, f"no xplane.pb under {logdir}"
    return xp[0]


def report(xplane_path: str, steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops" or not line.events:
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            busy = 0
            for ev in line.events:
                name = md[ev.metadata_id].name
                tot[name] += ev.duration_ps
                cnt[name] += 1
                busy += ev.duration_ps
            print(f"=== {plane.name} / XLA Ops: "
                  f"{busy / 1e6 / steps:.1f} us busy/step, "
                  f"{len(tot)} distinct ops ===")
            for name, ps in tot.most_common(top):
                print(f"{ps / 1e6 / steps:9.1f} us x{cnt[name] // steps:4d}"
                      f"  {name[:95]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsize", type=int, default=256)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--mode", default="train", choices=["train", "eval"])
    ap.add_argument("--logdir", default="/tmp/vqax_prof")
    ap.add_argument("--parse_only", default=None,
                    help="skip capture; parse this xplane.pb")
    args = ap.parse_args()
    if args.parse_only:
        xp = args.parse_only
    else:
        xp = capture(args)
        print("trace:", xp, file=sys.stderr)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    report(xp, args.steps, args.top)


if __name__ == "__main__":
    main()
