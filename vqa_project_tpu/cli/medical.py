"""Shared grid-search harness for the medical VQA variants.

Parity target: run_imageclef.py / run_mimic.py
(/root/reference/run_imageclef.py:39-243): for every
(neighbourhood, n_kernels) grid cell, train a FRESH model for --ep
epochs, run a sequential full-validation inference pass, append the
accuracy line to grid_search_nodes_{n_obj}.txt, save the per-config
checkpoint clef/mimic_{n_obj}_{kernels}_{neigh}_{acc}.pt, and keep the
best configuration's predictions CSV
(image_id, question, prediction, answer).

Divergence (documented): the per-config validation accuracy divides by
the number of VALIDATION questions. The reference divides by
n_train_batches*bsize (run_imageclef.py:201) and by 10*bsize in
run_mimic.py:208 — both copy-paste artifacts, not meaningful averages
(SURVEY.md section 7 "quirks to NOT replicate").
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import GraphVQADataset


def _str2bool(s: str) -> bool:
    if isinstance(s, bool):
        return s
    v = s.strip().lower()
    if v in ("true", "t", "yes", "y", "1"):
        return True
    if v in ("false", "f", "no", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {s!r}")


def medical_input_args(argv=None, *, n_obj_default=51,
                       neigh_default=19):
    """Flag surface of run_imageclef.py:245-285 (== run_mimic's)."""
    parser = argparse.ArgumentParser(
        description="Conditional Graph Convolutions for VQA "
                    "(medical, TPU-native)")
    # the reference uses type=bool here (run_imageclef.py:249), so
    # `--train False` silently parses as True (bool("False") is True).
    # Divergence (documented in PARITY.md): same flag name and default,
    # but an explicit str2bool so False/0/no actually mean False.
    parser.add_argument("--train", default=True, type=_str2bool,
                        nargs="?", const=True,
                        help="set this to training mode.")
    parser.add_argument("--n_kernels", type=int, default=8)
    parser.add_argument("--lr", metavar="", type=float, default=1e-3)
    parser.add_argument("--ep", metavar="", type=int, default=40)
    parser.add_argument("--bsize", type=int, default=8)
    parser.add_argument("--seed", type=int, default=1000)
    parser.add_argument("--hid", metavar="", type=int, default=1024)
    parser.add_argument("--emb", metavar="", type=int, default=300)
    parser.add_argument("--neighbourhood_size", type=int,
                        default=neigh_default)
    parser.add_argument("--n_obj", type=int, default=n_obj_default)
    parser.add_argument("--data_dir", metavar="", type=str, default="data")
    parser.add_argument("--save_dir", metavar="", type=str, default="save")
    parser.add_argument("--plot_dir", metavar="", type=str,
                        default="figures")
    parser.add_argument("--name", metavar="", type=str, default="gcn")
    parser.add_argument("--dropout", metavar="", type=float, default=0.4)
    parser.add_argument("--model_path", metavar="", type=str, default=None)
    # TPU additions
    parser.add_argument("--num_devices", type=int, default=None)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--neighbors_list", type=int, nargs="+",
                        default=[16, 20, 24, 28, 32, 36])
    parser.add_argument("--kernels_list", type=int, nargs="+",
                        default=[4, 8, 16, 32])
    args, unparsed = parser.parse_known_args(argv)
    return args, parser, unparsed


def train_one_config(args, train_ds, val_ds, ckpt_prefix: str,
                     shared=None) -> Tuple[List[str], float]:
    """Full training + sequential val inference for one grid cell
    (run_imageclef.py:39-212). Returns (csv_rows, val_acc%).

    shared: optional (mesh, train_cache, val_cache) built ONCE by the
    grid driver — a 24-cell grid would otherwise re-push the feature
    table to devices ~48 times (VERDICT round 2 item 7)."""
    from vqa_project_tpu.train.loop import _UNSET, evaluate, fit
    from vqa_project_tpu.train.state import save_checkpoint

    mesh, cache, val_cache = shared if shared else (None, _UNSET, _UNSET)
    mcfg = ModelConfig(
        emb_dim=args.emb, hid_dim=args.hid, n_kernels=args.n_kernels,
        neighbourhood_size=args.neighbourhood_size, n_obj=args.n_obj,
        dropout=args.dropout, compute_dtype=args.compute_dtype)
    tcfg = TrainConfig(
        lr=args.lr, epochs=args.ep, batch_size=args.bsize,
        eval_interval=0, seed=args.seed, save_dir=args.save_dir,
        num_devices=args.num_devices, log_interval=40)

    model, state, _train_acc = fit(tcfg, mcfg, train_ds, mesh=mesh,
                                   cache=cache, val_cache=val_cache)

    print("Infer")
    acc, result, _ = evaluate(model, state.params, val_ds, args.bsize,
                           result_path=None,
                           num_devices=args.num_devices,
                           mesh=mesh, cache=val_cache)
    # predictions CSV rows: image_id,question,prediction,answer
    # (run_imageclef.py:193-199). Map question_id -> dataset row
    # explicitly: real MIMIC question_ids are global CSV row indices
    # (offset by the train split and gappy where dicom_ids were
    # filtered), NOT json row indices.
    qid_to_row = {int(r["question_id"]): i
                  for i, r in enumerate(val_ds.vqa)}
    rows = []
    for r in result:
        row = val_ds.vqa[qid_to_row[int(r["question_id"])]]
        rows.append(f"{row['image_id']},{row['question']},"
                    f"{r['answer']},{row.get('answer', '')}")

    from vqa_project_tpu.parallel.multihost import is_primary

    if is_primary():  # rank-0-only artifact writes under multi-host
        os.makedirs(args.save_dir, exist_ok=True)
        name = (f"{ckpt_prefix}_{args.n_obj}_{args.n_kernels}_"
                f"{args.neighbourhood_size}_{acc:.2f}.pt")
        save_checkpoint(os.path.join(args.save_dir, name), state,
                        epoch=args.ep, extra={"accuracy": acc})
    return rows, acc


def grid_search_main(args, parser, unparsed, *, dataset_name: str,
                     ckpt_prefix: str):
    """The nested grid-search driver (run_imageclef.py:216-242)."""
    from vqa_project_tpu.parallel.multihost import \
        maybe_initialize_distributed
    from vqa_project_tpu.utils import enable_compilation_cache

    maybe_initialize_distributed()
    enable_compilation_cache()
    if len(unparsed) != 0:
        raise SystemExit("Unknown argument: {}".format(unparsed))
    if not args.train:
        parser.print_help()
        return

    train_ds, val_ds = _load_datasets(args, dataset_name)

    # one mesh + one feature-table push for the WHOLE grid: every cell
    # trains at the same n_obj/dtype, so the cache is config-invariant
    from vqa_project_tpu.train.loop import (_make_fit_mesh, _same_store,
                                            make_feature_cache)
    tcfg0 = TrainConfig(batch_size=args.bsize,
                        num_devices=args.num_devices)
    mesh = _make_fit_mesh(tcfg0)
    cache = make_feature_cache(train_ds, mesh, tcfg0, args.compute_dtype)
    val_cache = (cache if _same_store(val_ds.store, train_ds.store)
                 else make_feature_cache(val_ds, mesh, tcfg0,
                                         args.compute_dtype))
    shared = (mesh, cache, val_cache)

    from vqa_project_tpu.parallel.multihost import is_primary

    best_acc = 0.0
    grid_path = f"grid_search_nodes_{args.n_obj}.txt"
    # artifact writes (grid txt, best-config CSV) are rank-0-only under
    # multi-host, like every checkpoint write; the training/eval legs
    # below still run on every rank (they hold collectives). The file
    # handle IS the rank guard: f is None off-primary, so every write
    # site needs (and visibly has) its `if f` check.
    primary = is_primary()
    if primary:
        os.makedirs(args.plot_dir, exist_ok=True)
    f = open(grid_path, "w") if primary else None
    try:
        for neighbors in args.neighbors_list:
            for kernels in args.kernels_list:
                if kernels > args.n_obj or neighbors > args.n_obj:
                    continue
                args.n_kernels = kernels
                args.neighbourhood_size = neighbors
                print(args)
                rows, acc = train_one_config(args, train_ds, val_ds,
                                             ckpt_prefix, shared=shared)
                line = (f"neighbors: {neighbors}, kernels: {kernels}, "
                        f"Validation acc: {acc:.3f} %\n")
                print(line, end="")
                if f:
                    f.write(line)
                    f.flush()
                if acc > best_acc:
                    best_acc = acc
                    if primary:
                        csv_path = os.path.join(
                            args.plot_dir,
                            f"{ckpt_prefix}_{args.n_obj}_{acc:.2f}.csv")
                        with open(csv_path, "w") as f2:
                            f2.write("image_id,question,prediction,"
                                     "answer\n")
                            for line2 in rows:
                                f2.write(line2 + "\n")
    finally:
        if f:
            f.close()
    print(f"grid search done; best acc {best_acc:.3f} % -> {grid_path}")


def _ensure_synthetic_medical(sdir: str, knobs: dict, generate) -> None:
    """Regenerate a synthetic medical set when its knobs change.

    The knobs ARE the dataset: rerunning with a different --n_obj must
    not silently grid-search a stale store built for the old shape.
    Mirrors cli/run.py's fingerprint.json mechanism, including the
    pod-safe shape: rank 0 alone reads the fingerprint and regenerates;
    every rank crosses an UNCONDITIONAL barrier.
    """
    import json
    import shutil

    from vqa_project_tpu.parallel.multihost import (is_multiprocess,
                                                    is_primary)

    fp_path = os.path.join(sdir, "fingerprint.json")
    if is_primary():
        on_disk = None
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                on_disk = json.load(f)
        if on_disk != knobs:
            if os.path.exists(sdir):
                print("--synthetic knobs changed "
                      f"({on_disk} -> {knobs}): regenerating the "
                      "dataset", flush=True)
                shutil.rmtree(sdir)
            generate()
            tmp = fp_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(knobs, f)
            os.replace(tmp, fp_path)
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("synthetic-medical-ready")
        if not is_primary() and not os.path.exists(fp_path):
            # same shared-FS contract as cli/run.py's VQA-v2 leg: rank 0
            # generates, other ranks read the SAME directory
            raise FileNotFoundError(
                f"rank {os.environ.get('PROCESS_ID', '?')}: synthetic "
                f"dataset absent at {sdir} after the generation barrier. "
                "--data_dir must be a filesystem shared by all hosts; "
                "host-local data dirs are not supported with --synthetic "
                "on a pod.")


def _load_datasets(args, dataset_name: str):
    if dataset_name == "imageclef":
        if args.synthetic:
            from vqa_project_tpu.data.synthetic_medical import (
                generate_synthetic_imageclef)

            sdir = os.path.join(args.data_dir, "synthetic_imageclef")
            _ensure_synthetic_medical(
                sdir, {"n_obj": args.n_obj},
                lambda: generate_synthetic_imageclef(sdir,
                                                     n_obj=args.n_obj))
            args.data_dir = sdir
        # train and val share the single imageclef json (reference
        # behaviour, torch_dataset.py:197-203)
        train_ds = GraphVQADataset.imageclef(args.data_dir, "train",
                                             args.emb, args.n_obj)
        return train_ds, train_ds
    if dataset_name == "mimic":
        if args.synthetic:
            from vqa_project_tpu.data.synthetic_medical import (
                generate_synthetic_mimic)

            sdir = os.path.join(args.data_dir, "synthetic_mimic")
            _ensure_synthetic_medical(
                sdir, {"n_obj": args.n_obj},
                lambda: generate_synthetic_mimic(sdir, n_obj=args.n_obj))
            args.data_dir = sdir
        train_ds = GraphVQADataset.mimic(args.data_dir, "train",
                                         args.emb, args.n_obj)
        val_ds = GraphVQADataset.mimic(args.data_dir, "val",
                                       args.emb, args.n_obj)
        return train_ds, val_ds
    raise ValueError(dataset_name)
