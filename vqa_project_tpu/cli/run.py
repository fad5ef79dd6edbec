"""VQA v2 CLI: train / trainval / eval / test.

Parity target: /root/reference/run.py:476-533. Every public flag name is
preserved (--train/--trainval/--eval/--test, --lr, --ep, --bsize,
--n_kernels, --hid, --emb, --neighbourhood_size, --n_obj, --data_dir,
--save_dir, --plot_dir, --log_interval, --name, --dropout, --model_path),
with TPU additions (--num_devices, --compute_dtype, --pallas,
--synthetic) that do not collide with the reference surface.

Deliberate divergences from the reference defaults (documented per
SURVEY.md section 7 "quirks"): --trainval defaults to False here (the
reference's default=True makes a bare `python run.py` silently start a
40-epoch training run); --bsize defaults to 64 (the reference's 1 is not
its documented training setting); --model_path has no baked-in checkpoint
filename.

Unknown arguments raise, matching run.py:478-479.
"""

from __future__ import annotations

import argparse
import os

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import GraphVQADataset


def input_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Conditional Graph Convolutions for VQA (TPU-native)")
    parser.add_argument("--train", action="store_true", default=False,
                        help="set this to training mode.")
    parser.add_argument("--trainval", action="store_true", default=False,
                        help="set this to train+val mode.")
    parser.add_argument("--eval", action="store_true", default=False,
                        help="set this to evaluation mode.")
    parser.add_argument("--test", action="store_true", default=False,
                        help="set this to test mode.")
    parser.add_argument("--lr", metavar="", type=float, default=1e-4,
                        help="initial learning rate")
    parser.add_argument("--ep", metavar="", type=int, default=40,
                        help="number of epochs.")
    parser.add_argument("--bsize", metavar="", type=int, default=64,
                        help="batch size.")
    parser.add_argument("--n_kernels", type=int, default=8,
                        help="number of Gaussian kernels.")
    parser.add_argument("--hid", metavar="", type=int, default=1024,
                        help="hidden dimension")
    parser.add_argument("--emb", metavar="", type=int, default=300,
                        help="question embedding dimension")
    parser.add_argument("--neighbourhood_size", type=int, default=16,
                        help="number of graph neighbours to consider")
    parser.add_argument("--n_obj", type=int, default=36,
                        help="number of boxes per image")
    parser.add_argument("--data_dir", metavar="", type=str, default="./data",
                        help="path to data directory")
    parser.add_argument("--save_dir", type=str, default="./save")
    parser.add_argument("--plot_dir", type=str, default="./figures")
    parser.add_argument("--log_interval", type=int, default=40)
    parser.add_argument("--eval_interval", type=int, default=400)
    parser.add_argument("--name", metavar="", type=str, default="model",
                        help="model name")
    parser.add_argument("--dropout", metavar="", type=float, default=0.5,
                        help="dropout probability")
    parser.add_argument("--model_path", type=str, default=None,
                        help="trained model path.")
    # TPU-native additions
    parser.add_argument("--num_devices", type=int, default=None,
                        help="chips to use (default: all)")
    parser.add_argument("--tp", type=int, default=1,
                        help="model-parallel factor (2-D (data, model) "
                             "mesh; parameters + Adam moments sharded "
                             "per parallel/tp.py)")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--adam_mu_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="dtype of Adam's first moment (bfloat16 "
                             "halves its HBM traffic; float32 = exact "
                             "torch-Adam parity; default float32, or "
                             "bfloat16 under --fast_math)")
    parser.add_argument("--adam_nu_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="storage dtype of Adam's second moment "
                             "(update math stays f32; bfloat16 halves "
                             "nu's HBM traffic; default float32, or "
                             "bfloat16 under --fast_math)")
    parser.add_argument("--grad_reduce_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="dtype of the data-parallel gradient "
                             "all-reduce (bfloat16 halves the per-step "
                             "ICI bytes; float32 = bit-identical to "
                             "single-device training; default float32, "
                             "or bfloat16 under --fast_math when tp=1)")
    parser.add_argument("--fast_math", action="store_true",
                        help="preset: flip every opt-in bf16 STORAGE "
                             "knob left unset (adam_mu_dtype, "
                             "adam_nu_dtype, and — on a pure-DP mesh — "
                             "grad_reduce_dtype) to bfloat16. Update "
                             "math stays f32; trades exact torch-Adam "
                             "parity for HBM/ICI bandwidth. An explicit "
                             "--*_dtype always wins over the preset")
    parser.add_argument("--feature_cache_dtype", type=str,
                        default="auto",
                        choices=["auto", "bfloat16", "float32", "int8"],
                        help="dtype of the device-resident feature table; "
                             "auto follows --compute_dtype (bfloat16 "
                             "halves HBM + gather traffic at identical "
                             "model inputs — boxes stay float32); int8 "
                             "row-quantizes the table (~0.4%% input "
                             "error) so the full 123k-image VQA v2 "
                             "table fits one chip")
    parser.add_argument("--pallas", action="store_true",
                        help="force the fused Pallas graph kernel on "
                             "(default: auto — on for TPU backends)")
    parser.add_argument("--no_pallas", action="store_true",
                        help="force the fused Pallas graph kernel off")
    parser.add_argument("--pallas_gather", choices=["auto", "on", "off"],
                        default="auto",
                        help="feature-cache row gather: auto (default) "
                             "uses the ring-buffered Pallas DMA kernel "
                             "on TPU when the table tile-aligns "
                             "(measured 2x at multi-GB tables), else "
                             "jnp.take; on/off force it")
    add_synthetic_args(parser)
    parser.add_argument("--seed", type=int, default=1000)
    args, unparsed = parser.parse_known_args(argv)
    return args, parser, unparsed


def add_synthetic_args(parser):
    """The --synthetic flag group, shared by every front-end whose
    dataset loading goes through _dataset (run, serve): a parser that
    accepts --synthetic but lacks the knob flags would crash inside
    _dataset, which reads all of them to build the regeneration
    fingerprint."""
    parser.add_argument("--synthetic", action="store_true",
                        help="run on a generated synthetic mini-dataset")
    parser.add_argument("--synthetic_questions", type=int, default=96,
                        help="QA pairs in the synthetic set (changing any "
                             "--synthetic_* knob regenerates the dataset "
                             "in place on the next run)")
    parser.add_argument("--synthetic_images", type=int, default=24)
    parser.add_argument("--synthetic_feat_dim", type=int, default=64)
    parser.add_argument("--synthetic_vocab", type=int, default=40)
    parser.add_argument("--synthetic_answers", type=int, default=12,
                        help="answer-vocab size of the synthetic set "
                             "(3000 = the real VQA v2 head)")
    parser.add_argument("--synthetic_classes", type=int, default=0,
                        help="distinct image classes (0 = answers/2); "
                             "decoupled so a full-width head can pair "
                             "with a learnable class count")
    parser.add_argument("--synthetic_encoding", type=str,
                        default="scalar", choices=["scalar", "binary"],
                        help="how the image class is written into the "
                             "features (binary scales to many classes)")


def resolve_dtype_knobs(args):
    """Resolve the three opt-in bf16 storage knobs: explicit flag >
    --fast_math preset > float32. grad_reduce bf16 needs the 1-D data
    mesh + a replicated (or host-mode) cache; the mesh is known here
    (tp == 1 gate) but the cache MODE is not — a table exceeding the
    per-chip budget resolves to a ShardedFeatureCache inside fit(),
    which then degrades grad_reduce back to float32 with a warning
    (train/loop.py) instead of crashing."""
    fast = getattr(args, "fast_math", False)
    mu = args.adam_mu_dtype or ("bfloat16" if fast else "float32")
    nu = args.adam_nu_dtype or ("bfloat16" if fast else "float32")
    grad = args.grad_reduce_dtype or (
        "bfloat16" if fast and getattr(args, "tp", 1) == 1 else "float32")
    return mu, nu, grad


def make_configs(args):
    mu_dtype, nu_dtype, grad_dtype = resolve_dtype_knobs(args)
    mcfg = ModelConfig(
        emb_dim=args.emb, hid_dim=args.hid, n_kernels=args.n_kernels,
        neighbourhood_size=args.neighbourhood_size, n_obj=args.n_obj,
        dropout=args.dropout, compute_dtype=args.compute_dtype,
        use_pallas=(True if args.pallas
                    else False if args.no_pallas else "auto"))
    tcfg = TrainConfig(
        lr=args.lr, epochs=args.ep, batch_size=args.bsize,
        log_interval=args.log_interval, eval_interval=args.eval_interval,
        data_dir=args.data_dir, save_dir=args.save_dir,
        plot_dir=args.plot_dir, name=args.name, model_path=args.model_path,
        num_devices=args.num_devices, seed=args.seed,
        feature_cache_dtype=args.feature_cache_dtype,
        pallas_gather={"on": True, "off": False}.get(
            args.pallas_gather, "auto"),
        tp=args.tp, adam_mu_dtype=mu_dtype,
        adam_nu_dtype=nu_dtype,
        grad_reduce_dtype=grad_dtype)
    return mcfg, tcfg


def _dataset(args, split):
    if args.synthetic:
        import json

        from vqa_project_tpu.data.synthetic import generate_synthetic_vqa

        sdir = os.path.join(args.data_dir, "synthetic")
        # fingerprint of every generation knob: a rerun with different
        # --synthetic_* flags on the same --data_dir must regenerate, not
        # silently train the stale artifacts (the knobs are the dataset)
        knobs = dict(n_obj=args.n_obj,
                     n_questions=args.synthetic_questions,
                     n_images=args.synthetic_images,
                     feat_dim=args.synthetic_feat_dim,
                     q_vocab=args.synthetic_vocab,
                     n_answers=args.synthetic_answers,
                     n_classes=args.synthetic_classes,
                     class_encoding=args.synthetic_encoding)
        fp_path = os.path.join(sdir, "fingerprint.json")
        from vqa_project_tpu.parallel.multihost import (is_multiprocess,
                                                        is_primary)

        # rank-0-only decision AND generation: on a pod every rank sees
        # the same shared --data_dir, and an unguarded rmtree+regenerate
        # would let rank 1 delete zarr files rank 0 is mid-write (or
        # leave ranks training on divergent host data, breaking
        # put_global's identical-host-value invariant). Non-primary
        # ranks never read the fingerprint — a rank that happened to
        # read it AFTER rank 0 wrote it would take a different branch
        # and skip collectives rank 0 participates in (pod hang).
        if is_primary():
            on_disk = None
            if os.path.exists(fp_path):
                with open(fp_path) as f:
                    on_disk = json.load(f)
            if on_disk != knobs:
                if os.path.exists(sdir):
                    # the subdir is wholly machine-generated; wiping it
                    # keeps a shrunk n_images/n_questions from leaving
                    # stale store entries behind
                    import shutil

                    print(f"Synthetic knobs changed vs {fp_path} — "
                          "regenerating the dataset", flush=True)
                    shutil.rmtree(sdir)
                generate_synthetic_vqa(sdir, with_test=True, **knobs)
                # atomic replace: a crash mid-write must not leave a
                # truncated fingerprint that parses as a JSON error on
                # the next launch
                tmp = fp_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(knobs, f)
                os.replace(tmp, fp_path)
        if is_multiprocess():
            # UNCONDITIONAL barrier (same pattern as the med_data leg in
            # tests/_multihost_child.py): every rank reaches it exactly
            # once per _dataset call regardless of what rank 0 decided,
            # so the collective schedules can't diverge across ranks
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("synthetic-data-ready")
            if not is_primary() and not os.path.exists(fp_path):
                # rank-0-only generation assumes --data_dir is a SHARED
                # filesystem across hosts; on host-local dirs the files
                # simply never appear on non-primary ranks — fail with
                # the actual cause instead of a missing-zarr traceback
                raise FileNotFoundError(
                    f"rank {os.environ.get('PROCESS_ID', '?')}: synthetic "
                    f"dataset absent at {sdir} after the generation "
                    "barrier. --data_dir must be a filesystem shared by "
                    "all hosts (rank 0 generates, other ranks read); "
                    "host-local data dirs are not supported with "
                    "--synthetic on a pod.")
        return GraphVQADataset.vqa2(sdir, split, args.emb, args.n_obj)
    return GraphVQADataset.vqa2(args.data_dir, split, args.emb, args.n_obj)


def train(args):
    """Train-split mode with periodic mini-validation (run.py:117-272)."""
    from vqa_project_tpu.train.loop import fit

    mcfg, tcfg = make_configs(args)
    print("Loading data")
    train_ds = _dataset(args, "train")
    val_ds = _dataset(args, "val")
    _print_params(train_ds, args)
    fit(tcfg, mcfg, train_ds, val_ds,
        resume_path=args.model_path, save_every_epoch=True,
        jsonl_path=os.path.join(args.save_dir, "metrics.jsonl"))


def trainval(args):
    """Train on train+val, save the final named checkpoint
    (run.py:344-473; filename convention run.py:469-470)."""
    from vqa_project_tpu.train.loop import fit
    from vqa_project_tpu.train.state import save_checkpoint

    mcfg, tcfg = make_configs(args)
    print("Loading data")
    ds = _dataset(args, "trainval")
    _print_params(ds, args)
    model, state, acc = fit(
        tcfg, mcfg, ds, resume_path=args.model_path,
        jsonl_path=os.path.join(args.save_dir, "metrics.jsonl"))
    from vqa_project_tpu.parallel.multihost import is_primary

    if is_primary():  # rank-0-only artifact writes under multi-host
        os.makedirs(args.save_dir, exist_ok=True)
        name = (f"vqa_{args.n_obj}_{args.n_kernels}_"
                f"{args.neighbourhood_size}_{acc:.2f}.pt")
        save_checkpoint(os.path.join(args.save_dir, name), state,
                        epoch=tcfg.epochs,
                        extra={"accuracy": acc, "config": vars(args)})
        print(f"Saved {name}")


def eval_model(args):
    """Validation accuracy + EvalAI result.json (run.py:36-114)."""
    acc = _run_eval(args, split="val", compute_acc=True)
    print("accuracy: {} %".format(acc))
    print("Validation done")


def test(args):
    """Test-split result.json for EvalAI (run.py:274-341): labels are
    unknown (all-zero votes), so no accuracy is computed or reported."""
    _run_eval(args, split="test", compute_acc=False)
    print("Testing done")


def restore_params(model, ds, payload):
    """Restore checkpointed params into a freshly-initialized template
    (shape checking comes from from_state_dict). Init runs on zero
    arrays shaped from dataset metadata — no batch materialization."""
    import flax
    import jax
    import jax.numpy as jnp

    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, ds.max_qlen), jnp.int32),
        jnp.zeros((2, ds.n_obj, ds.feat_dim), jnp.float32),
        jnp.ones((2,), jnp.int32))
    return flax.serialization.from_state_dict(params, payload["params"])


def _run_eval(args, split, compute_acc):
    from vqa_project_tpu.train.loop import build_model, evaluate
    from vqa_project_tpu.train.state import load_checkpoint

    if not (args.model_path and os.path.isfile(args.model_path)):
        raise SystemExit("Need to provide model path.")
    print("Resuming from checkpoint %s" % args.model_path)
    mcfg, tcfg = make_configs(args)
    print("Loading data")
    ds = _dataset(args, split)
    _print_params(ds, args)
    model = build_model(mcfg, ds)
    payload, _ = load_checkpoint(args.model_path)
    params = restore_params(model, ds, payload)
    # tcfg carries the cache knobs (--feature_cache_dtype,
    # --pallas_gather, ...): without it an --eval launch silently
    # rebuilt a default TrainConfig and ignored them
    acc, _, _ = evaluate(model, params, ds, args.bsize,
                         result_path="result.json",
                         num_devices=args.num_devices,
                         train_cfg=tcfg)
    return acc if compute_acc else None


def _print_params(ds, args):
    print("Parameters:\n\t"
          "vocab size: %d\n\tembedding dim: %d\n\tfeature dim: %d"
          "\n\thidden dim: %d\n\toutput dim: %d" % (
              ds.q_words, args.emb, ds.feat_dim, args.hid, ds.n_answers))


def main(argv=None):
    from vqa_project_tpu.parallel.multihost import \
        maybe_initialize_distributed
    from vqa_project_tpu.utils import enable_compilation_cache

    # must run before the first jax.devices() call in a pod launch
    # (VQAX_DIST=1 or VQAX_COORDINATOR=host:port; no-op otherwise)
    maybe_initialize_distributed()
    enable_compilation_cache()
    args, parser, unparsed = input_args(argv)
    if len(unparsed) != 0:
        raise SystemExit("Unknown argument: {}".format(unparsed))
    ran = False
    if args.train:
        train(args)
        ran = True
    if args.trainval:
        trainval(args)
        ran = True
    if args.eval:
        eval_model(args)
        ran = True
    if args.test:
        test(args)
        ran = True
    if not ran:
        parser.print_help()


if __name__ == "__main__":
    main()
