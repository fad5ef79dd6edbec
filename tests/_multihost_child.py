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

    # params digest must agree bit-for-bit across ranks (replicated
    # state updated by identical SPMD steps)
    leaves = jax.tree.leaves(
        jax.tree.map(lambda x: np.asarray(x), state.params))
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(leaf).tobytes())

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
    h_sh = hashlib.sha256()
    for leaf in jax.tree.leaves(
            jax.tree.map(lambda x: np.asarray(x), state_sh.params)):
        h_sh.update(np.ascontiguousarray(leaf).tobytes())

    print(json.dumps({
        "pid": pid,
        "acc": acc,
        "eval_acc": eval_acc,
        "n_result": len(result),
        "params_sha": h.hexdigest(),
        "sharded_acc": acc_sh,
        "sharded_params_sha": h_sh.hexdigest(),
        "ckpt_written": sorted(os.listdir(tcfg.save_dir))
        if os.path.isdir(tcfg.save_dir) else [],
    }), flush=True)


if __name__ == "__main__":
    main()
