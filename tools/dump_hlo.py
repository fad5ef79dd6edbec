"""Dump the optimized (post-layout) HLO of the bench train step.

Compiles the REAL training step at bench dimensions on the current
backend and writes the optimized HLO module (with op_name/source
metadata) to --out, so layout copies and fusions seen in the op-level
profile (tools/profile_step.py) can be attributed to JAX source ops.

Usage:
    python tools/dump_hlo.py [--bsize 256] [--out /tmp/step.hlo.txt]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bsize", type=int, default=256)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--out", default="/tmp/step.hlo.txt")
    args = ap.parse_args()

    from vqa_project_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import Batcher, GraphVQADataset
    from vqa_project_tpu.data.loader import pack_index_batch
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.parallel import make_mesh, replicate, shard_batch
    from vqa_project_tpu.train.loop import build_model, make_feature_cache
    from vqa_project_tpu.train.state import create_train_state, make_optimizer
    from vqa_project_tpu.train.steps import build_train_step

    suffix = "" if args.images == 96 else f"_{args.images}"
    data_dir = os.path.join(tempfile.gettempdir(), f"vqa_bench_data{suffix}")
    if not os.path.exists(os.path.join(data_dir, "train_q_dict.p")):
        generate_synthetic_vqa(
            data_dir, n_images=args.images,
            n_questions=max(4 * args.bsize, 4096), n_obj=36,
            feat_dim=2048, q_vocab=13_000, n_answers=3000, seed=7)
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=36, max_qlen=16)
    mcfg = ModelConfig(compute_dtype="bfloat16",
                       use_pallas=(False if args.no_pallas else "auto"))
    tcfg = TrainConfig(batch_size=args.bsize)
    model = build_model(mcfg, ds)
    mesh = make_mesh()
    cache = make_feature_cache(ds, mesh, tcfg, mcfg.compute_dtype)
    tx = make_optimizer(tcfg, 100)
    sample = next(iter(Batcher(ds, args.bsize)))
    state = create_train_state(model, mcfg, tx, sample, seed=0)
    state = replicate(state, mesh)
    step = build_train_step(model, tx, mesh, feature_cache=cache,
                            n_answers=ds.n_answers)
    loader = Batcher(ds, args.bsize, shuffle=True, drop_last=True,
                     materialize=cache is None)
    batch = shard_batch(pack_index_batch(next(iter(loader))), mesh)
    compiled = step.jit_step.lower(state, batch,
                                   step.cache_arrays).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")


if __name__ == "__main__":
    main()
