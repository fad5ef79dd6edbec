"""AOT cost analysis of the train/eval step at bench dimensions.

Prints XLA's cost_analysis (flops, bytes accessed) and the implied
HBM/MXU roofline times for the compiled step — the tool behind the
README's "HBM-bound" claims. Usage:

    python tools/step_costs.py [--bsize 256] [--eval] [--images 96]

Mirrors bench.py's synthetic setup (same dims: 2048+4-d features,
K=36, hid 1024, 3001 answers).
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
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--take", action="store_true",
                    help="force the jnp.take gather instead of DMA")
    ap.add_argument("--hbm_gbps", type=float, default=819.0,
                    help="v5e HBM bandwidth for the roofline line")
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
    from vqa_project_tpu.train.steps import build_eval_step, build_train_step

    data_dir = os.path.join(tempfile.gettempdir(),
                            f"vqa_costs_{args.images}")
    if not os.path.exists(os.path.join(data_dir, "train_q_dict.p")):
        generate_synthetic_vqa(
            data_dir, n_images=args.images,
            n_questions=max(4 * args.bsize, 4096), n_obj=36,
            feat_dim=2048, q_vocab=13_000, n_answers=3000, seed=7)
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=36, max_qlen=16)

    mcfg = ModelConfig(compute_dtype="bfloat16", use_pallas=args.pallas)
    tcfg = TrainConfig(batch_size=args.bsize,
                       pallas_gather=False if args.take else "auto")
    model = build_model(mcfg, ds)
    mesh = make_mesh()
    cache = make_feature_cache(ds, mesh, tcfg, mcfg.compute_dtype)
    tx = make_optimizer(tcfg, 100)
    sample = next(iter(Batcher(ds, args.bsize)))
    state = create_train_state(model, mcfg, tx, sample, seed=0)
    state = replicate(state, mesh)

    loader = Batcher(ds, args.bsize, shuffle=True, drop_last=True,
                     materialize=cache is None)
    batch = next(iter(loader))
    if "image_row" in batch:
        batch = pack_index_batch(batch)
    batch = shard_batch(batch, mesh)

    if args.eval:
        step = build_eval_step(model, mesh, feature_cache=cache,
                               n_answers=ds.n_answers,
                               pallas_gather=tcfg.pallas_gather)
        example = (state.params, batch, step.cache_arrays)
    else:
        step = build_train_step(model, tx, mesh, feature_cache=cache,
                                n_answers=ds.n_answers,
                                pallas_gather=tcfg.pallas_gather)
        example = (state, batch, step.cache_arrays)

    compiled = step.jit_step.lower(*example).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    flops = costs.get("flops", float("nan"))
    bytes_acc = costs.get("bytes accessed", float("nan"))
    print(f"flops/step:          {flops/1e9:10.2f} GFLOP")
    print(f"bytes accessed/step: {bytes_acc/1e9:10.2f} GB")
    print(f"HBM roofline @ {args.hbm_gbps:.0f} GB/s: "
          f"{bytes_acc/args.hbm_gbps/1e6:.2f} ms/step")
    peak_bf16 = 394e12  # v5e peak bf16 FLOP/s
    print(f"MXU roofline @ 394 TFLOP/s (bf16): {flops/peak_bf16*1e3:.2f} "
          "ms/step")
    extra = {k: v for k, v in costs.items()
             if k not in ("flops", "bytes accessed") and v}
    for k in sorted(extra):
        print(f"  {k}: {extra[k]:.3e}")


if __name__ == "__main__":
    main()
