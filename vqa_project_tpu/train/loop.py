"""Training / evaluation harnesses.

Parity targets: train / trainval / eval_model / test
(/root/reference/run.py:36-473). Behavioural notes:

- we follow the maintained `trainval` code path semantics (SURVEY.md
  section 7 "quirks to NOT replicate"): scheduler steps AFTER each epoch,
  3-output model unpack, final named checkpoint
  vqa_{n_obj}_{n_kernels}_{neigh}_{acc:.2f};
- the 40-step loss/accuracy averaging and the every-eval_interval
  mini-validation of `train` mode are preserved;
- eval/test emit the EvalAI result.json schema
  ([{question_id, answer}], run.py:100-113).

All device work is two jitted executables (train step / eval step) over a
data mesh; the host loop only assembles batches and logs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from vqa_project_tpu.config import ModelConfig, TrainConfig
from vqa_project_tpu.data import Batcher, GraphVQADataset, prefetch_to_device
from vqa_project_tpu.data.loader import pack_index_batch
from vqa_project_tpu.models import GraphVQAModel
from vqa_project_tpu.parallel import make_mesh, multihost, replicate, \
    shard_batch
from vqa_project_tpu.train.metrics import MetricLogger
from vqa_project_tpu.train.state import (
    TrainState,
    create_train_state,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
)
from vqa_project_tpu.train.steps import build_eval_step, build_train_step


def build_model(model_cfg: ModelConfig, ds: GraphVQADataset) -> GraphVQAModel:
    """Instantiate the model with dataset-derived dims (run.py:156-163).

    Resolves use_pallas="auto" here (TPU -> fused kernel, else XLA) so
    the flax module only ever sees a bool."""
    import dataclasses

    from vqa_project_tpu.config import resolve_use_pallas

    use_pallas = resolve_use_pallas(model_cfg.use_pallas)
    cfg = dataclasses.replace(
        model_cfg,
        vocab_size=ds.q_words,
        emb_dim=ds.pretrained_wemb.shape[1],
        feat_dim=ds.feat_dim,
        out_dim=ds.n_answers,
        n_obj=ds.n_obj,
        max_qlen=ds.max_qlen,
        use_pallas=bool(use_pallas),
    )
    return GraphVQAModel(cfg=cfg, pretrained_wemb=ds.pretrained_wemb)


def _maybe_pack_for_dma(feats, train_cfg):
    """Pack an (N, K, F) table into the DMA gather kernel's tile-aligned
    (N, S, K*F/S) layout when the knob + backend + shape allow (a free
    host-side view). Returns (feats, (K, F)) packed or (feats, None).

    Single source for the gate — the replicated and int8 cache builders
    must never drift on when packing applies ("auto" or True counts as
    on; TPU-only: the packed layout buys nothing in interpret mode).
    """
    if not getattr(train_cfg, "pallas_gather", False):
        return feats, None
    import jax as _jax

    from vqa_project_tpu.ops.pallas.gather_rows import pack_table, packable

    if (_jax.default_backend() != "tpu"
            or not packable(feats.shape, feats.dtype)):
        return feats, None
    _, k, f = feats.shape
    return pack_table(feats), (k, f)


def _make_int8_cache(store, mesh, train_cfg, compute_dtype):
    """Replicated int8 row-quantized feature cache, or None if even the
    int8 table exceeds the per-chip budget (steps.QuantizedFeatureCache
    documents the why: 9.2 GB vs 18.4 GB bf16 at the real 123k-image
    table — single-chip residency). Replicated-only: the mesh-sharded
    cache keeps full precision (its tables are already per-chip-sized).
    """
    import jax.numpy as jnp

    from vqa_project_tpu.ops.quant import quantize_feature_table
    from vqa_project_tpu.train.steps import QuantizedFeatureCache

    feats = np.asarray(store.features)
    n, k, _ = feats.shape
    nbytes = feats.size + n * k * 4 + store.boxes.nbytes
    if nbytes > train_cfg.device_cache_bytes:
        print(f"int8 feature table {nbytes / 1e9:.1f} GB still exceeds "
              "the device cache budget; using the sharded/host modes "
              "at the compute dtype", flush=True)
        return None
    q, scales = quantize_feature_table(feats)
    q, kf = _maybe_pack_for_dma(q, train_cfg)
    return QuantizedFeatureCache(
        features=replicate(jnp.asarray(q), mesh),
        scales=replicate(jnp.asarray(scales), mesh),
        boxes=replicate(jnp.asarray(np.asarray(store.boxes)), mesh),
        kf=kf, out_dtype=compute_dtype or "float32")


def make_feature_cache(ds: GraphVQADataset, mesh,
                       train_cfg: TrainConfig,
                       compute_dtype: Optional[str] = None):
    """Device-resident feature cache.

    Mode selection by the per-chip HBM budget (device_cache_bytes):
    - table fits on one chip -> replicated (features, boxes) tuple;
    - fits only divided across the mesh -> ShardedFeatureCache (image
      axis sharded; batches must then use locality partitions);
    - neither -> None (host streaming of dense batches).

    feature_cache_dtype="auto" stores the table in compute_dtype (the
    model casts features there anyway; boxes stay f32 — see config.py).
    """
    import jax.numpy as jnp

    from vqa_project_tpu.parallel.sharded_cache import ShardedFeatureCache

    store = ds.store
    cache_dtype = train_cfg.feature_cache_dtype
    if cache_dtype == "auto":
        cache_dtype = compute_dtype or "float32"
    if cache_dtype == "int8":
        qc = _make_int8_cache(store, mesh, train_cfg, compute_dtype)
        if qc is not None:
            return qc
        # int8 doesn't fit replicated either: fall through to the
        # sharded/host modes at the compute dtype
        cache_dtype = compute_dtype or "float32"
    dtype = np.dtype(cache_dtype)
    nbytes = (store.features.size * dtype.itemsize + store.boxes.nbytes)
    n_chips = mesh.devices.size
    if nbytes <= train_cfg.device_cache_bytes:
        feats = np.asarray(store.features)
        if dtype != np.float32:
            feats = feats.astype(dtype)
        # the 3rd tuple element carries the logical (K, F) so the step
        # can reshape DMA-gathered rows back
        feats, kf = _maybe_pack_for_dma(feats, train_cfg)
        pair = (
            replicate(jnp.asarray(feats), mesh),
            replicate(jnp.asarray(np.asarray(store.boxes)), mesh),
        )
        return pair if kf is None else pair + (kf,)
    if len(mesh.shape) > 1:
        # sharded cache assumes a 1-D data mesh (locality partitions
        # count chips on the data axis); with tp > 1 fall through to
        # host streaming rather than mis-partition.
        print(f"feature table {nbytes / 1e9:.1f} GB exceeds device "
              "cache budget and mesh has a model axis; streaming from "
              "host (sharded cache is 1-D-mesh only)", flush=True)
        return None
    if n_chips > 1 and nbytes / n_chips <= train_cfg.device_cache_bytes:
        print(f"feature table {nbytes / 1e9:.1f} GB: sharding across "
              f"{n_chips} chips ({nbytes / n_chips / 1e9:.1f} GB/chip)",
              flush=True)
        return ShardedFeatureCache.build(store, mesh,
                                         train_cfg.data_axis, dtype)
    print(f"feature table {nbytes / 1e9:.1f} GB exceeds device cache "
          "budget; streaming features from host", flush=True)
    return None


def _make_fit_mesh(train_cfg: TrainConfig):
    """1-D data mesh, or a 2-D (data, model) mesh when tp > 1."""
    if getattr(train_cfg, "tp", 1) > 1:
        from vqa_project_tpu.parallel import make_mesh_2d

        return make_mesh_2d(train_cfg.tp, train_cfg.num_devices,
                            train_cfg.data_axis)
    return make_mesh(train_cfg.num_devices, train_cfg.data_axis)


def _place_state(state, mesh, train_cfg: TrainConfig):
    """Replicate (pure DP) or rule-shard (tp > 1) the train state."""
    if getattr(train_cfg, "tp", 1) > 1:
        from vqa_project_tpu.parallel import shard_state

        return shard_state(state, mesh)
    return replicate(state, mesh)


def _same_store(a, b) -> bool:
    """True when two FeatureStores are backed by the same packed files."""
    if a is b:
        return True
    fa = getattr(a.features, "filename", None)
    fb = getattr(b.features, "filename", None)
    return fa is not None and fa == fb


def _locality_kwargs(cache, ds: GraphVQADataset) -> dict:
    """Batcher kwargs for locality batching over a sharded cache."""
    from vqa_project_tpu.parallel.sharded_cache import ShardedFeatureCache

    if isinstance(cache, ShardedFeatureCache):
        return {"partitions": cache.partitions()[ds.table.image_row],
                "n_partitions": cache.mesh.devices.size}
    return {}


# sentinel distinguishing "not passed" from "host mode" (cache=None)
_UNSET = object()


def fit(
    train_cfg: TrainConfig,
    model_cfg: ModelConfig,
    train_ds: GraphVQADataset,
    val_ds: Optional[GraphVQADataset] = None,
    *,
    resume_path: Optional[str] = None,
    save_every_epoch: bool = False,
    jsonl_path: Optional[str] = None,
    mesh=None,
    cache=_UNSET,
    val_cache=_UNSET,
) -> Tuple[GraphVQAModel, TrainState, float]:
    """Run the training loop; returns (model, state, final epoch acc %).

    mesh / cache / val_cache accept PREBUILT values so repeated fits
    (the medical grid search trains a fresh model per cell) push the
    feature table to devices once, not once per cell — at the real
    4.8 GB table each push re-streams the whole table through the
    host->device link (VERDICT round 2 item 7)."""
    if mesh is None:
        mesh = _make_fit_mesh(train_cfg)
    n_chips = mesh.shape[train_cfg.data_axis]  # batch shards over data only
    bs = train_cfg.batch_size
    if bs % n_chips:
        raise ValueError(f"batch_size {bs} not divisible by {n_chips} "
                         "data-parallel chips")

    model = build_model(model_cfg, train_ds)
    if cache is _UNSET:
        cache = make_feature_cache(train_ds, mesh, train_cfg,
                                   model_cfg.compute_dtype)
    loader = Batcher(train_ds, bs, shuffle=True, seed=train_cfg.seed,
                     drop_last=True, materialize=cache is None,
                     **_locality_kwargs(cache, train_ds))
    steps_per_epoch = len(loader)
    tx = make_optimizer(train_cfg, steps_per_epoch)
    # shape-only init batch from dataset metadata: a REAL first batch
    # gathers ~75 MB of features plus two (bs, 3001) dense label arrays
    # from the memmap for nothing (init is input-value independent —
    # verified param-bit-identical to a materialized batch)
    sample = {
        "question": np.zeros((2, train_ds.max_qlen), np.int32),
        "image": np.zeros((2, train_ds.n_obj, train_ds.feat_dim),
                          np.float32),
        "qlen": np.ones((2,), np.int32),
    }
    state = create_train_state(model, model.cfg, tx, sample, train_cfg.seed)
    start_epoch = 0
    resume_skip = 0
    if resume_path and not os.path.isfile(resume_path):
        # a typo'd resume path must not silently train from scratch and
        # overwrite the checkpoint lineage it was meant to continue
        # (the eval path already errors on a missing model path)
        raise FileNotFoundError(
            f"resume checkpoint not found: {resume_path}")
    if resume_path:
        print(f"Resuming from checkpoint {resume_path}")
        start_epoch, resume_skip, state = _resume_checkpoint(resume_path,
                                                             state)
        if resume_skip:
            # mid-epoch checkpoint (written at an eval_interval boundary):
            # finish the interrupted epoch first — its shuffle stream is
            # keyed on the epoch index, and the first resume_skip batches
            # were already trained, so skip exactly those
            start_epoch -= 1
            print(f"Mid-epoch checkpoint: resuming epoch {start_epoch} "
                  f"at step {resume_skip}/{steps_per_epoch}")
        # fast-forward the per-epoch deterministic shuffle so the
        # resumed epoch sees the exact batches the uninterrupted run
        # would have (bit-exact resume; data/loader.py::set_epoch)
        loader.set_epoch(start_epoch, skip=resume_skip)
    state = _place_state(state, mesh, train_cfg)

    grad_reduce = getattr(train_cfg, "grad_reduce_dtype", "float32")
    if grad_reduce == "bfloat16" and mesh.devices.size > 1:
        # the cache MODE is only known here (a large table resolves to
        # ShardedFeatureCache), so presets like --fast_math must degrade
        # rather than crash; the support matrix lives in ONE place
        # (steps.supports_bf16_reduce) so this gate can't drift from the
        # builder's hard errors
        from vqa_project_tpu.train.steps import supports_bf16_reduce

        ok, why = supports_bf16_reduce(mesh, cache)
        if not ok:
            print("grad_reduce_dtype=bfloat16 needs the 1-D data mesh "
                  "with a replicated (or host-mode) feature cache; this "
                  f"run uses {why} — falling back to the exact float32 "
                  "gradient all-reduce", flush=True)
            grad_reduce = "float32"
    train_step = build_train_step(
        model, tx, mesh, feature_cache=cache,
        n_answers=train_ds.n_answers,
        pallas_gather=train_cfg.pallas_gather,
        grad_reduce_dtype=grad_reduce)
    eval_step = None
    val_iter = None
    if val_ds is not None:
        # val shares the train feature cache when both adapters packed
        # the same store (VQA 'train'/'val' both read trainval.zarr; the
        # FeatureStore objects are distinct, so compare the backing
        # memmap files)
        if val_cache is _UNSET:
            val_cache = (cache
                         if _same_store(val_ds.store, train_ds.store)
                         else make_feature_cache(val_ds, mesh, train_cfg,
                                                 model_cfg.compute_dtype))
        if (isinstance(val_cache, tuple)
                and os.environ.get("VQAX_RESIDENT_EVAL", "1") == "1"):
            # one-dispatch mini-val (see _mini_validation_resident)
            from vqa_project_tpu.train.steps import build_eval_epoch

            eval_step = build_eval_epoch(
                model, mesh, feature_cache=val_cache,
                n_answers=val_ds.n_answers,
                pallas_gather=train_cfg.pallas_gather,
                data_axis=train_cfg.data_axis)
            eval_step.resident = True
        else:
            eval_step = build_eval_step(
                model, mesh, feature_cache=val_cache,
                n_answers=val_ds.n_answers,
                pallas_gather=train_cfg.pallas_gather)
            eval_step.resident = False
        val_iter = _infinite_batches(
            Batcher(val_ds, bs, shuffle=True, seed=train_cfg.seed + 1,
                    materialize=val_cache is None,
                    **_locality_kwargs(val_cache, val_ds)))

    logger = MetricLogger(train_cfg.log_interval, jsonl_path,
                          n_chips=n_chips, batch_size=bs)

    def put(b):
        # index batches travel as two packed arrays (tunnel RPCs are the
        # per-step bottleneck, see data.loader.pack_index_batch)
        if "image_row" in b:
            b = pack_index_batch(b)
        return shard_batch(b, mesh, train_cfg.data_axis)

    epoch_acc = 0.0
    for ep in range(start_epoch, start_epoch + train_cfg.epochs):
        ep_loss, ep_score, ep_valid = 0.0, 0.0, 0.0
        # n_steps is the POSITION within the epoch (so eval_interval
        # checkpoints land at the same global steps as the uninterrupted
        # run after a mid-epoch resume); trained counts batches actually
        # run this process-lifetime, for the loss denominator
        n_steps = resume_skip if ep == start_epoch else 0
        trained = 0
        window = []  # device scalars; fetched once per log window to
        #              avoid a ~20 ms blocking D2H per step

        def flush_window():
            nonlocal ep_loss, ep_score, ep_valid, window
            # ONE device_get for the whole window: per-scalar np.asarray
            # would issue a blocking ~20 ms D2H per element (3x
            # log_interval sequential round trips per flush on the
            # tunneled backend); device_get starts every copy async and
            # blocks once
            import jax

            fetched = jax.device_get(window)
            losses = np.asarray([w["loss"] for w in fetched], np.float64)
            scores = np.asarray([w["score"] for w in fetched], np.float64)
            valid = np.asarray([w["valid"] for w in fetched], np.float64)
            ep_loss += float(losses.sum())
            ep_score += float(scores.sum())
            ep_valid += float(valid.sum())
            logger.log_window(epoch=ep, step=int(state.step),
                              loss_sum=float(losses.sum()),
                              score_sum=float(scores.sum()),
                              n=len(window),
                              examples=float(valid.sum()))
            window = []

        for batch in prefetch_to_device(iter(loader), put,
                                        train_cfg.prefetch):
            state, m = train_step(state, batch)
            window.append(m)
            n_steps += 1
            trained += 1

            if len(window) >= logger.log_interval:
                flush_window()

            if (val_iter is not None and train_cfg.eval_interval
                    and n_steps % train_cfg.eval_interval == 0):
                if eval_step.resident:
                    acc = _mini_validation_resident(
                        eval_step, state.params, val_iter, mesh,
                        train_cfg.data_axis)
                else:
                    acc = _mini_validation(eval_step, state.params,
                                           val_iter, put, bs)
                print(f"Validation accuracy: {acc:.2f} %", flush=True)
                # n_steps == steps_per_epoch means the epoch IS complete
                # (the modulo makes that save an epoch-boundary one)
                _save_epoch_ckpt(train_cfg, state, ep,
                                 step_in_epoch=n_steps % steps_per_epoch)

        if window:
            flush_window()
        epoch_loss = ep_loss / max(trained, 1)
        epoch_acc = 100.0 * ep_score / max(ep_valid, 1.0)
        print("Epoch %02d done, average loss: %.3f, average accuracy: "
              "%.2f%%" % (ep + 1, epoch_loss, epoch_acc), flush=True)
        if save_every_epoch:
            _save_epoch_ckpt(train_cfg, state, ep)
    logger.close()
    return model, state, epoch_acc


def _is_torch_file(path: str) -> bool:
    """Delegates to state.is_torch_file (single sniffing rule; see its
    docstring). Kept as a module alias for existing call sites."""
    from vqa_project_tpu.train.state import is_torch_file

    return is_torch_file(path)


def _resume_checkpoint(path: str, state: TrainState
                       ) -> Tuple[int, int, TrainState]:
    """Resume from either checkpoint lineage: the native msgpack format,
    or a reference torch .pt (both on-disk formats; full-dict
    checkpoints additionally restore the Adam moments + step, matching
    the reference's optimizer.load_state_dict at run.py:176-181).

    Returns (next_epoch, step_in_epoch, state). step_in_epoch > 0 marks
    a mid-epoch checkpoint (written at an eval_interval boundary,
    run.py:239-244 semantics): the epoch it was written in is NOT done,
    and fit() must finish its remaining batches first. Torch
    checkpoints never carry the field (the reference only resumes at
    epoch starts), so they resume at an epoch boundary."""
    import jax
    import jax.numpy as jnp

    if not _is_torch_file(path):
        payload, new_state = load_checkpoint(path, state)
        extra = payload.get("extra") or {}
        return (int(payload.get("epoch", 0)),
                int(extra.get("step_in_epoch", 0)), new_state)

    from vqa_project_tpu.models.torch_import import load_torch_checkpoint

    params, opt_state, epoch = load_torch_checkpoint(path, state.opt_state)
    # tree_map doubles as a structure check against the template
    params = jax.tree.map(lambda t, p: jnp.asarray(p, t.dtype),
                          state.params, params)
    step = state.step
    if opt_state is not None:
        import optax

        for s in opt_state:
            if isinstance(s, optax.ScaleByAdamState):
                step = jnp.asarray(s.count, jnp.int32)
    return epoch, 0, TrainState(
        params=params,
        opt_state=state.opt_state if opt_state is None else opt_state,
        step=step, rng=state.rng)


def _save_epoch_ckpt(cfg: TrainConfig, state: TrainState, ep: int,
                     step_in_epoch: int = 0):
    if not multihost.is_primary():  # rank-0-only artifact writes
        return
    os.makedirs(cfg.save_dir, exist_ok=True)
    # epoch records the NEXT epoch to run, matching the reference's resume
    # contract (run.py:179 start_ep = ckpt['epoch'] with epoch saved as
    # ep + 1). step_in_epoch > 0 marks a mid-epoch (eval_interval) save:
    # epoch ep is not finished, and _resume_checkpoint hands the count to
    # fit() so the resumed run trains exactly the remaining batches.
    save_checkpoint(
        os.path.join(cfg.save_dir, f"{cfg.name}_{ep + 1}.ckpt"),
        state, epoch=ep + 1,
        extra={"step_in_epoch": int(step_in_epoch)})


def _infinite_batches(batcher: Batcher):
    while True:
        yield from batcher


def _mini_validation_resident(eval_epoch, params, val_iter, mesh,
                              data_axis, n_batches: int = 10) -> float:
    """One-dispatch variant of _mini_validation: stack the 10 random val
    batches, ONE H2D, one lax.scan dispatch, ONE score fetch — the
    streaming variant pays a ~20 ms blocking D2H per batch through the
    tunnel, ~10% of training wall time at the reference's
    eval_interval=400 (run.py:248-259)."""
    from vqa_project_tpu.train.steps import stack_epoch_batches

    hosts = [next(val_iter) for _ in range(n_batches)]
    n_valid = float(sum(h["mask"].sum() for h in hosts))
    epoch_arrays, _ = stack_epoch_batches(hosts, mesh, data_axis)
    total, _ = eval_epoch(params, epoch_arrays)
    return float(total) / max(n_valid, 1.0) * 100.0


def _mini_validation(eval_step, params, val_iter, put, bs,
                     n_batches: int = 10) -> float:
    """10-batch random-subset validation (run.py:248-259). The
    denominator counts only valid (mask=1) rows — padded rows of
    locality/final batches score 0 and must not dilute the accuracy."""
    del bs
    correct = 0.0
    n_valid = 0.0
    for _ in range(n_batches):
        host = next(val_iter)
        n_valid += float(host["mask"].sum())
        _, score, _ = eval_step(params, put(host))
        correct += float(score)
    return correct / max(n_valid, 1.0) * 100.0


def evaluate(
    model: GraphVQAModel,
    params,
    ds: GraphVQADataset,
    batch_size: int,
    *,
    result_path: Optional[str] = "result.json",
    num_devices: Optional[int] = None,
    data_axis: str = "data",
    collect_adjacency: bool = False,
    max_batches: Optional[int] = None,
    mesh=None,
    cache=_UNSET,
    train_cfg=None,
) -> Tuple[float, List[dict], Optional[Dict[int, np.ndarray]]]:
    """Sequential evaluation producing the EvalAI result list and the VQA
    accuracy (run.py:36-114 / 274-341).

    Always returns a 3-tuple (acc, result, adjacencies); adjacencies is
    None unless collect_adjacency, else a {dataset_row: (K, K) array}
    dict (partitioned sharded-cache batches visit rows out of order, so
    a dict is the only order-safe container). max_batches stops after
    that many batches — the accuracy is then over the rows actually seen
    (visualization needs a handful of figures, not a full-split sweep).
    mesh / cache accept prebuilt values (see fit) so callers that
    evaluate repeatedly push the feature table once.
    """
    if mesh is None:
        mesh = make_mesh(num_devices, data_axis)
    # eval batches shard over the data axis only (a 2-D tp mesh keeps its
    # model axis replicated for the batch), so divisibility is against the
    # data extent — same rule fit() applies at its own check
    n_chips = dict(mesh.shape).get(data_axis, mesh.devices.size)
    if batch_size % max(n_chips, 1):
        # same operator-facing message as fit(): a non-divisible batch
        # otherwise dies deep inside device_put with an opaque
        # partitioning error
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{n_chips} data-parallel chips")
    if cache is _UNSET:
        if train_cfg is None:
            from vqa_project_tpu.config import TrainConfig as _TC

            train_cfg = _TC(batch_size=batch_size)
        # train_cfg carries the cache knobs (--feature_cache_dtype,
        # --pallas_gather, device_cache_bytes): an eval-only launch
        # must honor them — the int8 cache exists precisely so the
        # full table fits one chip at eval time too
        cache = make_feature_cache(ds, mesh, train_cfg,
                                   model.cfg.compute_dtype)
    params = replicate(params, mesh)
    loader = Batcher(ds, batch_size, shuffle=False,
                     materialize=cache is None,
                     **_locality_kwargs(cache, ds))
    batches = iter(loader)
    if max_batches is not None:
        import itertools

        batches = itertools.islice(batches, max_batches)

    # Resident fast path (default on replicated device caches): stack
    # the whole epoch on device and run ONE lax.scan dispatch — the
    # classic loop below pays per-step H2D + two per-step D2H fetches
    # (~20 ms each through the tunnel) against a ~2 ms forward.
    # VQAX_RESIDENT_EVAL=0 restores the streaming loop. Sharded-cache
    # (locality-partitioned batches stay per-step) and host mode (dense
    # epoch would not fit) keep the classic loop, as does the
    # adjacency-collecting visualization path ((S,B,K,K) stacked
    # adjacencies would be the one big output).
    if (isinstance(cache, tuple) and not collect_adjacency
            and os.environ.get("VQAX_RESIDENT_EVAL", "1") == "1"):
        from vqa_project_tpu.train.steps import build_eval_epoch, \
            stack_epoch_batches

        host_batches = list(batches)
        eval_epoch = build_eval_epoch(
            model, mesh, feature_cache=cache, n_answers=ds.n_answers,
            pallas_gather=getattr(train_cfg, "pallas_gather", False),
            data_axis=data_axis)
        epoch_arrays, _ = stack_epoch_batches(host_batches, mesh,
                                              data_axis)
        total, preds_all = eval_epoch(params, epoch_arrays)
        correct = float(total)
        preds_all = multihost.fetch_global(preds_all)
        result = []
        n_valid = 0.0
        for host_batch, preds in zip(host_batches, preds_all):
            mask = host_batch["mask"]
            n_valid += float(mask.sum())
            qids = host_batch["qid"]
            for i in np.flatnonzero(mask > 0):
                result.append({
                    "question_id": int(qids[i]),
                    "answer": ds.a_itow[int(preds[i])],
                })
        acc = correct / max(n_valid, 1.0) * 100.0
        if result_path and multihost.is_primary():
            with open(result_path, "w") as f:
                json.dump(result, f)
        return acc, result, None

    eval_step = build_eval_step(
        model, mesh, feature_cache=cache, n_answers=ds.n_answers,
        pallas_gather=getattr(train_cfg, "pallas_gather", False),
        return_adjacency=collect_adjacency)
    def put(b):
        if "image_row" in b:
            b = pack_index_batch(b)
        return shard_batch(b, mesh, data_axis)

    result: List[dict] = []
    adjacencies: Optional[Dict[int, np.ndarray]] = (
        {} if collect_adjacency else None)
    correct = 0.0
    n_valid = 0.0
    # keep the host copy alongside the device batch: qid/mask are read on
    # host, and a D2H fetch through the tunnel costs ~20 ms each
    put_pair = lambda b: (b, put(b))
    for host_batch, batch in prefetch_to_device(batches, put_pair, 2):
        preds, score, adjacency = eval_step(params, batch)
        correct += float(score)
        preds = multihost.fetch_global(preds)
        mask = host_batch["mask"]
        n_valid += float(mask.sum())
        qids = host_batch["qid"]
        for i in range(len(preds)):
            if mask[i] > 0:
                result.append({
                    "question_id": int(qids[i]),
                    "answer": ds.a_itow[int(preds[i])],
                })
        if collect_adjacency:
            # batch-sharded on a pod like preds: gather, don't fetch
            adj = multihost.fetch_global(adjacency)
            idxs = host_batch["index"]
            for i in range(len(preds)):
                if mask[i] > 0:
                    adjacencies[int(idxs[i])] = adj[i]

    # over a full pass n_valid == ds.n_questions (padded rows are mask=0),
    # matching the reference's len(dataset) denominator (run.py:106-110)
    acc = correct / max(n_valid, 1.0) * 100.0
    if result_path and multihost.is_primary():
        with open(result_path, "w") as f:
            json.dump(result, f)
    return acc, result, adjacencies
