"""Parity validation against a reference PyTorch checkpoint.

Loads a torch state_dict from the reference implementation
(vqa_{n_obj}_{n_kernels}_{neigh}_{acc}.pt), imports it into the flax
model (models/torch_import.py), evaluates on the requested split and —
when torch is importable — compares logits and learned adjacencies
sample-by-sample against the torch model's outputs would require the
reference code, so instead we report our own accuracy plus internal
consistency stats (adjacency norms, prediction distribution). The VQA
accuracy printed here is directly comparable to the reference's
published 66.2% (README.md:43).

Usage:
  python -m vqa_project_tpu.cli.validate_parity \
      --model_path save/vqa_36_8_16_XX.pt --data_dir ./data --split val
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="torch-checkpoint parity eval")
    p.add_argument("--model_path", type=str, required=True,
                   help="reference torch .pt state_dict")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--bsize", type=int, default=64)
    p.add_argument("--emb", type=int, default=300)
    p.add_argument("--hid", type=int, default=1024)
    p.add_argument("--n_kernels", type=int, default=8)
    p.add_argument("--neighbourhood_size", type=int, default=16)
    p.add_argument("--n_obj", type=int, default=36)
    p.add_argument("--combined_dim", type=int, default=512)
    p.add_argument("--num_devices", type=int, default=None)
    args, unparsed = p.parse_known_args(argv)
    if unparsed:
        raise SystemExit(f"Unknown argument: {unparsed}")

    import numpy as np

    from vqa_project_tpu.config import ModelConfig
    from vqa_project_tpu.data import GraphVQADataset
    from vqa_project_tpu.models.torch_import import load_torch_checkpoint
    from vqa_project_tpu.train.loop import build_model, evaluate

    print(f"importing torch checkpoint {args.model_path}")
    params = load_torch_checkpoint(args.model_path)

    ds = GraphVQADataset.vqa2(args.data_dir, args.split, args.emb,
                              args.n_obj)
    mcfg = ModelConfig(
        emb_dim=args.emb, hid_dim=args.hid, n_kernels=args.n_kernels,
        neighbourhood_size=args.neighbourhood_size, n_obj=args.n_obj,
        combined_dim=args.combined_dim, dropout=0.0)
    model = build_model(mcfg, ds)

    acc, result, adjacencies = evaluate(
        model, params, ds, args.bsize, result_path="result.json",
        collect_adjacency=True, num_devices=args.num_devices)
    adjacencies = np.stack([adjacencies[i] for i in sorted(adjacencies)])
    preds = [r["answer"] for r in result]
    uniq = len(set(preds))
    print(json.dumps({
        "split": args.split,
        "vqa_accuracy_pct": round(acc, 2),
        "reference_published_pct": 66.2,
        "n_questions": ds.n_questions,
        "unique_answers_predicted": uniq,
        "adjacency_mean_abs": float(np.abs(adjacencies).mean()),
        "adjacency_row_sum_std": float(adjacencies.sum(-1).std()),
    }, indent=2))


if __name__ == "__main__":
    main()
