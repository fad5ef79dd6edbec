"""Jitted train/eval steps over a data-parallel mesh.

Sharding model: computation follows data. Batches are device_put with a
batch-axis NamedSharding, state is replicated onto the mesh once; jit
infers the SPMD partitioning and inserts the gradient all-reduce over ICI.
(Explicit in_shardings/out_shardings are deliberately NOT passed: on the
axon-tunneled backend they trigger a per-call resharding slow path —
~50x step latency — while inferred shardings run at full speed.)

State donation is mandatory on this backend: without it every step leaks
a full parameter+optimizer copy through the tunnel.

Ingest modes:
- device-cache mode (default when the feature table fits in HBM): region
  features + boxes are resident on device; the host sends only token ids,
  lengths and SPARSE answer/vote entries per batch (~KB instead of ~40 MB
  at batch 128), and the step gathers features and densifies labels
  on-chip. This is what makes the tunnel/H2D bottleneck disappear.
- host mode: the batch already carries dense image/answers/votes arrays
  (used when the table exceeds HBM).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vqa_project_tpu.ops import multilabel_soft_margin_loss
from vqa_project_tpu.train.state import TrainState


class QuantizedFeatureCache(NamedTuple):
    """int8 device feature table + per-box dequantization scales.

    The reference's zarr table is f32 RCNN features (the model input at
    torch_dataset.py:148-154); on TPU the table is pure HBM residency
    and gather traffic, so an int8 row-quantized copy (q = round(x /
    scale), scale = per-box absmax/127) quarters residency vs f32 and
    halves it vs bf16 — at the real 123k-image scale (18.4 GB bf16)
    that is the difference between fitting one v5e chip (9.2 GB int8)
    and needing the mesh-sharded cache. Dequantization runs inside the
    step right after the row gather (make_image_fn) and fuses into the
    first projection's operand read; the model sees `out_dtype`
    features and is unchanged. Opt-in: feature_cache_dtype="int8".

    NamedTuple (not dataclass) on purpose: the replicated-cache
    isinstance(x, tuple) checks in loop.py/bench.py stay true, so the
    resident-eval and bf16-reduce fast paths apply unchanged.
    """

    features: object   # (N, K, F) int8, or packed (N, S, K*F/S) view
    scales: object     # (N, K) float32 per-box scale
    boxes: object      # (N, K, 4) float32
    kf: object         # None, or (K, F) when `features` is packed
    out_dtype: str     # dequantization target (the compute dtype)


def densify_labels(idx: jnp.ndarray, val: jnp.ndarray,
                   n_classes: int) -> jnp.ndarray:
    """Scatter sparse (B, S) index/value label entries into dense (B, C).

    Mirrors QuestionTable.dense_answers (host) on device; pad entries
    point at column n_classes-1 which is cleared afterwards (the unused
    '+1' answer slot, torch_dataset.py:54,117).
    """
    b = idx.shape[0]
    dense = jnp.zeros((b, n_classes), jnp.float32)
    ar = jnp.arange(b)[:, None]
    dense = dense.at[ar, idx].set(val.astype(jnp.float32))
    return dense.at[:, n_classes - 1].set(0.0)


def sparse_vqa_score(logits: jnp.ndarray, vote_idx: jnp.ndarray,
                     vote_val: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Official VQA score from SPARSE vote entries: min(votes[pred]/3, 1).

    Avoids materializing the (B, 3001) votes tensor entirely.
    """
    pred = jnp.argmax(logits, axis=-1).astype(vote_idx.dtype)
    hit = (vote_idx == pred[:, None]).astype(jnp.float32)
    picked = jnp.sum(hit * vote_val.astype(jnp.float32), axis=-1)
    score = jnp.minimum(picked / 3.0, 1.0)
    if mask is not None:
        score = jnp.where(mask > 0, score, 0.0)
    return jnp.sum(score)


def _pin_per_chip(gather_local, mesh, data_axis):
    """Pin a (table, rows) -> rows-batched gather per-chip via shard_map.

    SPMD has no native partitioning rule for a Pallas custom call;
    shard_map runs it per-chip (table replicated, rows/output
    batch-sharded — the same layout the jnp.take path gets from XLA's
    gather rules). Identity on a single-device (or absent) mesh.
    Batches always shard over the FIRST mesh axis (the data axis by
    construction in mesh.py / tp.py), so a non-default
    TrainConfig.data_axis resolves correctly without every builder
    threading the name through.
    """
    if mesh is None or mesh.devices.size <= 1:
        return gather_local
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    batch_spec = P(data_axis or mesh.axis_names[0])
    return shard_map(gather_local, mesh=mesh,
                     in_specs=(P(), batch_spec),
                     out_specs=batch_spec, check_vma=False)


def _make_quantized_image_fn(qcache: QuantizedFeatureCache, mesh,
                             data_axis):
    """image_fn for the int8 row-quantized table (see the NamedTuple).

    Gathers int8 rows (ring-DMA kernel when the table was packed, else
    jnp.take), gathers the (B, K) scales, and dequantizes in f32 before
    casting to the compute dtype — int8 values are exact in f32 AND
    bf16 (<= 8 mantissa bits), so the only rounding beyond quantization
    itself is the final cast, same as the bf16-table path. XLA fuses
    the dequant multiply into the gather consumer; it never hits HBM
    as a separate pass.
    """
    out_dt = jnp.dtype(qcache.out_dtype)

    if qcache.kf is not None:
        from vqa_project_tpu.ops.pallas.gather_rows import gather_rows_dma

        k, f = qcache.kf

        def gather_local(features, rows):
            feats = gather_rows_dma(features, rows)
            return feats.reshape(rows.shape[0], k, f)

        gather_local = _pin_per_chip(gather_local, mesh, data_axis)
    else:
        def gather_local(features, rows):
            return jnp.take(features, rows, axis=0, mode="clip")

    def image_fn(cache, rows):
        features, scales, boxes = cache
        q = gather_local(features, rows)
        sc = jnp.take(scales, rows, axis=0, mode="clip")
        feats = (q.astype(jnp.float32) * sc[:, :, None]).astype(out_dt)
        return feats, jnp.take(boxes, rows, axis=0, mode="clip")

    return image_fn, (qcache.features, qcache.scales, qcache.boxes)


def make_image_fn(feature_cache, pallas_gather=False, mesh=None,
                  data_axis: Optional[str] = None):
    """Normalize the cache argument into (image_fn, cache_arrays).

    feature_cache is either None (host mode), a (features, boxes) tuple
    of replicated device arrays, a (packed_features, boxes, (k, f))
    3-tuple (tile-aligned table for the DMA gather kernel — see
    loop.make_feature_cache), or a ShardedFeatureCache (mesh-sharded
    table + communication-free shard_map gather).

    The table arrays are returned SEPARATELY and must be passed to
    image_fn(cache_arrays, rows) as jit ARGUMENTS — closing over them
    would bake the multi-GB table into the compiled program as a
    constant (the axon remote-compile tunnel rejects such payloads with
    HTTP 413, and XLA may duplicate constants in HBM)."""
    if feature_cache is None:
        return None, ()
    if isinstance(feature_cache, QuantizedFeatureCache):
        return _make_quantized_image_fn(feature_cache, mesh, data_axis)
    if isinstance(feature_cache, tuple):
        if len(feature_cache) == 3:
            # (packed_features, boxes, (k, f)) from make_feature_cache:
            # the fast path. One kernel invocation ring-buffers all B
            # row copies HBM->HBM; measured 2.0x end-to-end vs
            # jnp.take at a 4.8 GB table (take's cost grows with table
            # size; the DMA kernel costs only the data movement).
            from vqa_project_tpu.ops.pallas.gather_rows import \
                gather_rows_dma

            packed, boxes_tbl, (k, f) = feature_cache

            def gather_local(features, rows):
                feats = gather_rows_dma(features, rows)
                return feats.reshape(rows.shape[0], k, f)

            gather_local = _pin_per_chip(gather_local, mesh, data_axis)

            def image_fn(cache, rows):
                features, boxes = cache
                return (gather_local(features, rows),
                        jnp.take(boxes, rows, axis=0, mode="clip"))

            return image_fn, (packed, boxes_tbl)

        pallas_gather = pallas_gather is True  # "auto" -> take here
        if pallas_gather:
            from vqa_project_tpu.ops.pallas.gather_rows import gather_rows

        def image_fn(cache, rows):
            features, boxes = cache
            # returned as a (features, boxes) PAIR: the model consumes
            # features in their stored dtype (no f32 round trip — with a
            # bf16 table that halves gather+concat HBM traffic) and reads
            # pseudo-coordinates from the f32 boxes.
            if pallas_gather:
                # blocked scalar-prefetch gather: interpret-safe path
                # for the virtual CPU mesh (the TPU path packs the
                # table and takes the DMA branch above)
                feats = gather_rows(features, rows)
            else:
                # mode="clip": rows are in-range by the Batcher's
                # invariant (padding repeats valid rows); the default
                # "fill" mode adds a full-batch select + bounds checks
                # (~113 MB of HBM traffic per step at batch 256)
                feats = jnp.take(features, rows, axis=0, mode="clip")
            return feats, jnp.take(boxes, rows, axis=0, mode="clip")

        return image_fn, feature_cache

    gather = feature_cache.gather_fn(pallas_gather is True)
    arrays = (feature_cache.features, feature_cache.boxes)
    return (lambda cache, rows: gather(cache[0], cache[1], rows)), arrays


def unpack_index_batch(batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Inverse of data.loader.pack_index_batch (device-side, inside jit)."""
    ints, floats = batch["ints"], batch["floats"]
    s = (floats.shape[1] - 1) // 2
    t = ints.shape[1] - 2 - 2 * s
    return {
        "question": ints[:, :t],
        "qlen": ints[:, t],
        "image_row": ints[:, t + 1],
        "ans_idx": ints[:, t + 2:t + 2 + s],
        "vote_idx": ints[:, t + 2 + s:],
        "ans_score": floats[:, :s],
        "vote_val": floats[:, s:2 * s],
        "mask": floats[:, 2 * s],
    }


def _assemble_inputs(batch: Dict[str, jax.Array], image_fn, cache,
                     n_answers: Optional[int]):
    """Return (question, image, qlen, answers_fn, score_fn)."""
    if "ints" in batch:
        batch.update(unpack_index_batch(batch))
    if image_fn is None:
        return (batch["question"], batch["image"], batch["qlen"],
                lambda: batch["answers"],
                lambda logits, mask=None: sparse_or_dense_score(
                    logits, batch, mask))
    image = image_fn(cache, batch["image_row"])
    return (batch["question"], image, batch["qlen"],
            lambda: densify_labels(batch["ans_idx"], batch["ans_score"],
                                   n_answers),
            lambda logits, mask=None: sparse_vqa_score(
                logits, batch["vote_idx"], batch["vote_val"], mask))


def sparse_or_dense_score(logits, batch, mask=None):
    """Dense-mode score helper (host mode carries dense votes) —
    delegates to the one canonical scoring op (ops/losses.py)."""
    from vqa_project_tpu.ops.losses import vqa_score

    return vqa_score(logits, batch["votes"], sample_mask=mask)


def build_train_step(model, tx, mesh,
                     feature_cache=None,
                     n_answers: Optional[int] = None,
                     pallas_gather=False,
                     grad_reduce_dtype: str = "float32") -> Callable:
    """Returns train_step(state, batch) -> (state, metrics).

    feature_cache: None (host mode), a (features, boxes) replicated
    tuple, or a ShardedFeatureCache; with a cache, batches carry
    image_row / sparse labels instead of dense tensors.

    grad_reduce_dtype: dtype of the data-parallel gradient all-reduce.
    "float32" (default) keeps the inferred-sharding jit path — exact,
    bit-identical across device counts. "bfloat16" switches to the
    explicit shard_map step (_build_bf16_reduce_step) that psums the
    gradient in bf16, halving the per-step ICI bytes.
    """
    if grad_reduce_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"grad_reduce_dtype must be float32|bfloat16, "
                         f"got {grad_reduce_dtype!r}")
    if grad_reduce_dtype == "bfloat16" and mesh.devices.size > 1:
        return _build_bf16_reduce_step(model, tx, mesh, feature_cache,
                                       n_answers, pallas_gather)
    # mesh is only needed to pin the Pallas DMA gather per-chip via
    # shard_map; everything else carries sharding by the arguments
    image_fn, cache_arrays = make_image_fn(feature_cache, pallas_gather,
                                           mesh)

    def step(state: TrainState, batch: Dict[str, jax.Array], cache
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, drop_rng = jax.random.split(state.rng)
        question, image, qlen, answers_fn, score_fn = _assemble_inputs(
            batch, image_fn, cache, n_answers)
        answers = answers_fn()

        def loss_fn(params):
            logits, _, _ = model.apply(
                params, question, image, qlen,
                train=True, rngs={"dropout": drop_rng})
            return multilabel_soft_margin_loss(
                logits, answers, batch["mask"]), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # Constrain the wembed gradient to column-major (default ON,
        # VQAX_EMB_GRAD_COLMAJOR=0 restores auto layout). XLA's auto
        # layout assignment carries the wembed param and its Adam
        # moments through the step column-major ({0,1}) while the
        # embedding gradient (a scatter over at most B*T rows) comes
        # out row-major, so every step paid full-f32[13001,300]
        # relayout copies around the Adam fusion (measured ~244 us at
        # bs 256: 63+54+53 us moments in/out, 28 us param, 2x23 us
        # below-cutoff twins). Aligning the ONE grad tensor with the
        # carried layout lets the whole update chain run copy-free:
        # op profile 6452.6 vs 6638.8 us busy (-186 us), copies gone.
        # Physical layout only — training is bit-identical (tested).
        # (Committing row-major input layouts in replicate() instead
        # was a no-op — jit relayouts committed inputs to its auto
        # entry layout.)
        if os.environ.get("VQAX_EMB_GRAD_COLMAJOR", "1") == "1":
            from jax.experimental.layout import Layout, \
                with_layout_constraint

            def _pin(path, x):
                if ("wembed" in jax.tree_util.keystr(path)
                        and getattr(x, "ndim", 0) == 2):
                    return with_layout_constraint(
                        x, Layout(tuple(reversed(range(x.ndim)))))
                return x

            grads = jax.tree_util.tree_map_with_path(_pin, grads)
        score = score_fn(logits, batch["mask"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state,
            step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "score": score,
                           "valid": jnp.sum(batch["mask"])}

    # donate only the state: batches are read host-side after the step
    # (qid/mask for result emission) and are tiny in device-cache mode;
    # the cache arrays are never donated (reused every step).
    jit_step = jax.jit(step, donate_argnums=(0,))

    def wrapper(state, batch):
        return jit_step(state, batch, cache_arrays)

    # exposed for tooling (tools/step_costs.py: AOT lower + cost_analysis;
    # bench.py device probe: raw_step is the unjitted (state, batch,
    # cache) body, scannable for a single-dispatch multi-step window)
    wrapper.jit_step = jit_step
    wrapper.raw_step = step
    wrapper.cache_arrays = cache_arrays
    return wrapper


def build_eval_step(model, mesh,
                    feature_cache=None,
                    n_answers: Optional[int] = None,
                    return_adjacency: bool = False,
                    pallas_gather=False) -> Callable:
    """Returns eval_step(params, batch) -> (preds, score, adjacency).

    adjacency is a 0-size placeholder unless return_adjacency=True —
    returning the (B, K, K) tensor every step costs real HBM/transfer
    bandwidth and only the visualization path wants it."""
    image_fn, cache_arrays = make_image_fn(feature_cache, pallas_gather,
                                           mesh)

    def step(params, batch, cache):
        question, image, qlen, _, score_fn = _assemble_inputs(
            batch, image_fn, cache, n_answers)
        logits, adjacency, _ = model.apply(
            params, question, image, qlen, train=False)
        # the last column is the answer-vocab pad slot (datasets.py:
        # n_answers = len(a_itow) + 1): it has no word, is never a
        # label, and an untrained/imported checkpoint whose argmax
        # lands there would KeyError the a_itow lookup in evaluate()
        # — mask it like serve.py does
        logits = logits.at[:, -1].set(-jnp.inf)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        score = score_fn(logits, batch["mask"])
        if not return_adjacency:
            adjacency = jnp.zeros((0,), jnp.float32)
        return preds, score, adjacency

    jit_step = jax.jit(step)

    def wrapper(params, batch):
        return jit_step(params, batch, cache_arrays)

    wrapper.jit_step = jit_step
    wrapper.cache_arrays = cache_arrays
    return wrapper


def supports_bf16_reduce(mesh, feature_cache):
    """Single source of truth for the bf16-gradient-reduce support
    matrix, shared by _build_bf16_reduce_step's hard errors and fit()'s
    soft degrade (train/loop.py) so the two cannot drift: the step
    needs the 1-D data mesh and a replicated (tuple) or host-mode
    (None) feature cache.

    Returns (ok, why): why names the unsupported ingredient when not ok.
    """
    if len(mesh.axis_names) != 1:
        return False, "a model-parallel mesh"
    if feature_cache is not None and not isinstance(feature_cache, tuple):
        # name the ACTUAL cache type: "mesh-sharded" would point an
        # operator running the replicated int8 QuantizedFeatureCache at
        # the wrong knob (table size / sharding instead of the cache
        # dtype) when diagnosing why the bf16 reduce was disabled
        return False, f"a {type(feature_cache).__name__} feature cache"
    return True, None


def _build_bf16_reduce_step(model, tx, mesh, feature_cache, n_answers,
                            pallas_gather) -> Callable:
    """Train step with an EXPLICIT bfloat16 gradient all-reduce.

    Why this exists: under the default inferred-sharding jit, GSPMD
    places the DP all-reduce at the partial weight-gradient dots, whose
    outputs are f32 — the step moves the full f32 gradient (112.8 MB at
    real dims, tools/scaling_report.py) over ICI, and casting grads
    AFTER value_and_grad cannot move that reduce (verified on the AOT
    HLO: the all-reduces stay f32). Controlling the reduction dtype
    requires owning the reduction, so this builder computes per-shard
    gradients under shard_map and reduces them itself with
    psum(g.astype(bf16)) — halving the collective bytes (~56 MB,
    ~1.1 ms on a v5e-8 ring vs ~2.2 ms). bf16 gradient reduction is
    standard large-scale practice; the reference is single-GPU and has
    no counterpart (SURVEY.md "Parallelism").

    Exactness notes (why it is opt-in, not the default):
    - each shard's gradient contribution rounds to bf16 before the sum
      (the f32 path's metrics/updates are otherwise reproduced exactly:
      the local masked loss SUM is scaled by the GLOBAL valid count, so
      psum(grad) equals the global-mean gradient up to that rounding);
    - the dropout stream folds in the data-axis index so shards
      decorrelate, which is not bit-identical to the global-jit stream;
    - supports the 1-D data mesh with a replicated (or host) feature
      cache; tp>1 and the mesh-sharded cache keep f32 reduction.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from vqa_project_tpu.ops.losses import soft_margin_per_sample

    ok, why = supports_bf16_reduce(mesh, feature_cache)
    if not ok:
        raise ValueError(
            f"grad_reduce_dtype=bfloat16 does not support {why}: it "
            "needs the 1-D data mesh (tp=1) with a replicated device "
            "feature cache or host-mode batches")
    axis = mesh.axis_names[0]
    # mesh=None: the row gather runs per-chip INSIDE this step's own
    # shard_map, so the per-chip (non-shard_map) kernel is the right one
    image_fn, cache_arrays = make_image_fn(feature_cache, pallas_gather,
                                           None)

    def local_grads(params, batch, cache, drop_rng):
        drop_rng = jax.random.fold_in(drop_rng, jax.lax.axis_index(axis))
        question, image, qlen, answers_fn, score_fn = _assemble_inputs(
            batch, image_fn, cache, n_answers)
        answers = answers_fn()
        mask = batch["mask"]
        nvalid = jax.lax.psum(jnp.sum(mask.astype(jnp.float32)), axis)
        denom = jnp.maximum(nvalid, 1.0)

        def loss_fn(p):
            logits, _, _ = model.apply(
                p, question, image, qlen,
                train=True, rngs={"dropout": drop_rng})
            per_sample = soft_margin_per_sample(logits, answers)
            per_sample = jnp.where(mask > 0, per_sample, 0.0)
            return jnp.sum(per_sample) / denom, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g.astype(jnp.bfloat16), axis)
            .astype(jnp.float32), grads)
        return (grads, jax.lax.psum(loss, axis),
                jax.lax.psum(score_fn(logits, mask), axis), nvalid)

    grads_sm = shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    def step(state: TrainState, batch: Dict[str, jax.Array], cache
             ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, drop_rng = jax.random.split(state.rng)
        grads, loss, score, valid = grads_sm(
            state.params, batch, cache, drop_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, rng=rng)
        return new_state, {"loss": loss, "score": score, "valid": valid}

    jit_step = jax.jit(step, donate_argnums=(0,))

    def wrapper(state, batch):
        return jit_step(state, batch, cache_arrays)

    wrapper.jit_step = jit_step
    wrapper.cache_arrays = cache_arrays
    return wrapper


# keys an eval scan step actually reads; host-only keys (qid, index)
# and label-densify keys (ans_idx/ans_score, unused in eval) stay off
# the device
_EPOCH_KEYS = ("question", "image_row", "qlen", "vote_idx", "vote_val",
               "mask")


def stack_epoch_batches(batches, mesh, data_axis: Optional[str] = None,
                        keys: Optional[tuple] = None):
    """Stack index-mode batch dicts into (S, B, ...) device arrays.

    One device_put for the whole eval epoch (vs one H2D per step): the
    tunnel's per-transfer latency is what bounds the classic eval loop
    once the step itself is ~2 ms. Batch axis 1 is sharded over the
    mesh's data axis; the step axis is unsharded (the scan walks it).

    keys defaults to the eval-scan set (_EPOCH_KEYS); the bench device
    probe passes + ("ans_idx", "ans_score") so the TRAIN step can scan
    the same way (densify_labels needs the sparse label fields).

    Returns (epoch_arrays, n_steps).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert batches, "empty eval epoch"
    assert "image_row" in batches[0], \
        "resident eval needs index-mode batches (device feature cache)"
    from vqa_project_tpu.parallel.mesh import put_named

    stacked = {k: np.stack([b[k] for b in batches])
               for k in (keys or _EPOCH_KEYS)}
    sh = NamedSharding(mesh, P(None, data_axis or mesh.axis_names[0]))
    return ({k: put_named(v, sh) for k, v in stacked.items()},
            len(batches))


def build_eval_epoch(model, mesh,
                     feature_cache=None,
                     n_answers: Optional[int] = None,
                     pallas_gather=False,
                     data_axis: Optional[str] = None) -> Callable:
    """Whole-epoch device-resident eval: ONE dispatch per epoch.

    The classic per-step eval loop is ingest-bound on the tunneled
    backend: the eval step is ~2.0 ms busy (op profile) but the loop
    measures ~3.4 ms/step — host batch assembly + per-step H2D never
    catch up with a forward that short. This runner takes the stacked
    (S, B, ...) epoch produced by stack_epoch_batches (resident on
    device) and lax.scan's the eval step over the step axis, returning
    (total_score, (S, B) int32 preds) — two fetches per EPOCH instead
    of two per step.

    Replaces the reference's per-batch python eval loop
    (/root/reference/run.py:92-110) with compiler-scheduled iteration —
    the idiomatic XLA formulation of a fixed eval sweep.

    Requires a replicated device feature cache (tuple form); the
    sharded-cache and host modes keep the classic loop (their batches
    are locality-partitioned / carry dense tensors).
    """
    image_fn, cache_arrays = make_image_fn(feature_cache, pallas_gather,
                                           mesh, data_axis)
    assert image_fn is not None, \
        "build_eval_epoch requires a device feature cache"

    def epoch(params, epoch_batches, cache):
        def body(total, batch):
            question, image, qlen, _, score_fn = _assemble_inputs(
                batch, image_fn, cache, n_answers)
            logits, _, _ = model.apply(
                params, question, image, qlen, train=False)
            # pad-slot mask: see build_eval_step
            logits = logits.at[:, -1].set(-jnp.inf)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return total + score_fn(logits, batch["mask"]), preds

        return jax.lax.scan(body, jnp.float32(0.0), epoch_batches)

    jit_epoch = jax.jit(epoch)

    def wrapper(params, epoch_batches):
        return jit_epoch(params, epoch_batches, cache_arrays)

    wrapper.jit_epoch = jit_epoch
    return wrapper
