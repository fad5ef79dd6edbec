"""Child program for the real 2-process multi-host integration test.

Launched once per rank by tests/test_multihost.py::test_two_process_pod.
Each process sees 4 local virtual CPU devices; jax.distributed glues
them into one 8-device global mesh, exactly like one JAX process per
TPU host in a pod slice. Runs the REAL framework path — fit() with the
multi-host array assembly, then the resident evaluate() whose
prediction fetch allgathers across ranks — and prints one JSON line the
parent compares across ranks.

Not a pytest file (leading underscore): it must own interpreter-level
setup (platform + distributed init before first device use).
"""

import hashlib
import json
import os
import sys


def main():
    pid, nproc, port, data_dir, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["VQAX_COORDINATOR"] = f"localhost:{port}"
    os.environ["VQAX_NUM_PROCESSES"] = str(nproc)
    os.environ["VQAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vqa_project_tpu.parallel.multihost import (
        is_multiprocess,
        is_primary,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed()
    assert jax.process_count() == nproc
    assert is_multiprocess() and (is_primary() == (pid == 0))

    import numpy as np

    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import GraphVQADataset
    from vqa_project_tpu.train.loop import evaluate, fit

    mcfg = ModelConfig(
        emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
        neighbourhood_size=4, dropout=0.1, max_qlen=10,
        compute_dtype="float32", use_pallas=False)
    tcfg = TrainConfig(lr=5e-3, epochs=2, batch_size=32, eval_interval=0,
                       save_dir=os.path.join(out_dir, f"rank{pid}"),
                       log_interval=1000)
    ds = GraphVQADataset.vqa2(data_dir, "train", n_obj=8, max_qlen=10)
    model, state, acc = fit(
        tcfg, mcfg, ds, save_every_epoch=True,
        jsonl_path=os.path.join(tcfg.save_dir, "metrics.jsonl"))

    def sha(params):
        hh = hashlib.sha256()
        for leaf in jax.tree.leaves(jax.tree.map(np.asarray, params)):
            hh.update(np.ascontiguousarray(leaf).tobytes())
        return hh.hexdigest()

    # params digest must agree bit-for-bit across ranks (replicated
    # state updated by identical SPMD steps)
    params_sha = sha(state.params)

    rpath = os.path.join(out_dir, f"rank{pid}_result.json")
    eval_acc, result, _ = evaluate(model, state.params, ds, 32,
                                   result_path=rpath)

    # mesh-SHARDED feature cache across the two hosts (the production
    # path for tables larger than one chip's HBM): a tiny
    # device_cache_bytes forces the table to shard over all 8 global
    # devices (4 per host), with locality-partitioned batches and the
    # shard_map gather running under multi-controller SPMD
    import dataclasses

    nbytes = (np.asarray(ds.store.features).nbytes
              + np.asarray(ds.store.boxes).nbytes)
    tcfg_sh = dataclasses.replace(
        tcfg, epochs=1, device_cache_bytes=nbytes // 4,
        save_dir=os.path.join(out_dir, f"rank{pid}_sh"))
    _, state_sh, acc_sh = fit(tcfg_sh, mcfg, ds)
    sharded_params_sha = sha(state_sh.params)

    # --- resume leg (VERDICT r3 item 4): both ranks restart from rank
    # 0's mid-run checkpoint (the shared-filesystem pod pattern — rank 1
    # reads a file it never wrote) and must reach the UNINTERRUPTED
    # 2-epoch run's parameters BIT-identically: per-epoch deterministic
    # shuffle (data/loader.py) + restored step/rng/Adam state, the
    # reference resume contract (run.py:176-181) under multi-controller.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rank0-ckpt-visible")
    ckpt1 = os.path.join(out_dir, "rank0", "model_1.ckpt")
    assert os.path.exists(ckpt1), ckpt1
    tcfg_res = dataclasses.replace(
        tcfg, epochs=1, save_dir=os.path.join(out_dir, f"rank{pid}_res"))
    _, state_res, _ = fit(tcfg_res, mcfg, ds, resume_path=ckpt1)
    resume_sha = sha(state_res.params)

    # --- synthetic-dataset regeneration leg (the CLI's rank-0-only
    # fingerprint path): rank 0 decides + regenerates while rank 1 —
    # which must NEVER read the fingerprint, lest a late read after
    # rank 0's write send it down a different branch — waits at the
    # unconditional barrier. Called twice (regenerate, then cache-hit)
    # to prove both branches reach the same number of collectives.
    import argparse

    from vqa_project_tpu.cli.run import _dataset

    syn_args = argparse.Namespace(
        synthetic=True, data_dir=os.path.join(out_dir, "syn_data"),
        emb=16, n_obj=8, synthetic_questions=24, synthetic_images=4,
        synthetic_feat_dim=16, synthetic_vocab=12, synthetic_answers=6,
        synthetic_classes=0, synthetic_encoding="scalar")
    syn_rows = [len(_dataset(syn_args, "train")) for _ in range(2)]
    assert syn_rows[0] == syn_rows[1] > 0, syn_rows

    # --- one medical grid cell (cli/medical.py) under the pod: fit +
    # full evaluate + rank-0-only artifacts (grid txt, ckpt, best CSV).
    # Per-rank CWDs make any non-gated write show up as a rank-1 file.
    from vqa_project_tpu.data.synthetic_medical import (
        generate_synthetic_imageclef)

    med_data = os.path.join(out_dir, "med_data")
    if pid == 0:  # rank-0-only generation; others wait at the barrier
        generate_synthetic_imageclef(med_data, n_images=6,
                                     n_questions=32, n_obj=9,
                                     feat_dim=16, q_vocab=12, n_answers=6)
    multihost_utils.sync_global_devices("med-data-ready")
    cwd = os.path.join(out_dir, f"cwd{pid}")
    os.makedirs(cwd, exist_ok=True)
    os.chdir(cwd)
    from vqa_project_tpu.cli.medical import (grid_search_main,
                                             medical_input_args)

    med_args, med_parser, med_unparsed = medical_input_args([
        "--data_dir", med_data,
        "--save_dir", os.path.join(out_dir, f"med_save{pid}"),
        "--plot_dir", os.path.join(out_dir, f"med_plot{pid}"),
        "--ep", "1", "--bsize", "8", "--hid", "24", "--emb", "16",
        "--n_obj", "9", "--compute_dtype", "float32",
        "--neighbors_list", "4", "--kernels_list", "3",
    ])
    grid_search_main(med_args, med_parser, med_unparsed,
                     dataset_name="imageclef", ckpt_prefix="clef")
    med_grid = os.path.join(cwd, "grid_search_nodes_9.txt")
    med_artifacts = sorted(
        os.listdir(cwd)
        + (os.listdir(os.path.join(out_dir, f"med_save{pid}"))
           if os.path.isdir(os.path.join(out_dir, f"med_save{pid}"))
           else [])
        + (os.listdir(os.path.join(out_dir, f"med_plot{pid}"))
           if os.path.isdir(os.path.join(out_dir, f"med_plot{pid}"))
           else []))

    print(json.dumps({
        "pid": pid,
        "acc": acc,
        "eval_acc": eval_acc,
        "n_result": len(result),
        "params_sha": params_sha,
        "sharded_acc": acc_sh,
        "sharded_params_sha": sharded_params_sha,
        "resume_sha": resume_sha,
        "syn_rows": syn_rows,
        "med_grid_line": (open(med_grid).read().strip()
                          if os.path.exists(med_grid) else ""),
        "med_artifacts": med_artifacts,
        "ckpt_written": sorted(os.listdir(tcfg.save_dir))
        if os.path.isdir(tcfg.save_dir) else [],
    }), flush=True)


if __name__ == "__main__":
    main()
