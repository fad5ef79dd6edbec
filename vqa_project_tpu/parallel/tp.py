"""Tensor-parallel (2-D mesh) parameter sharding.

The reference is strictly single-GPU (SURVEY.md §2: DataParallel exists
only as commented-out code, run.py:387-390), so every multi-device axis
here is net-new capability. The 1-D data mesh (mesh.py) is the right
default for this model family — parameters are ~130 MB, far under one
chip's HBM — but the framework also provides model parallelism for the
regimes where it pays: very large answer vocabularies (the classifier
pair out_1/out_2 is (hid, A) + (A, A), quadratic in the vocab — at
A=3001 out_2 is already 40% of all parameters), large GloVe/vocab
embedding tables, and many-kernel graph convolutions.

Design: a 2-D ``(data, model)`` mesh. Batches shard on ``data`` exactly
as in the 1-D case; parameters and their Adam moments shard on
``model`` by suffix rules:

- weight-norm ``v`` (in, out) -> P(None, "model"): output-column
  sharding; the per-column norm/g/bias math is then fully local, and
  XLA inserts one all-gather (or keeps the activation sharded) at the
  consumer. Covers the graph-learner edge layers and the classifier —
  including the (A, A) out_2.
- ``g``/``b`` (out,) -> P("model") to match their column.
- GRU ``w_ih``/``w_hh`` (3H, in) -> P("model", None) with biases
  P("model"): gate-block row sharding (each chip owns a contiguous
  slice of the r/z/n gate rows).
- ``conv_kernels`` (in, out) fused, column block n = kernel n ->
  P(None, "model"), and the Gaussian mean/precision vectors
  (n_kernels,) -> P("model"): the MoNet kernel axis is embarrassingly
  parallel (expert-parallel-style — each chip evaluates its own
  Gaussian kernels end-to-end; out = n*d, so column sharding by tp |
  n_kernels splits on kernel boundaries).
- ``wembed`` (vocab, emb) -> P("model", None): vocab-sharded embedding
  gather.

Everything else (scalars, step counts, RNG keys) replicates. Gradient
reduction over ``data`` and any resharding over ``model`` are inserted
by XLA under SPMD jit — there are no hand-written collectives, matching
the framework's design rule (mesh.py).

Why no PP/SP: the model is 4 matmul blocks deep (pipeline bubbles would
dwarf the stages) and questions are <=16 tokens (nothing to
sequence-shard); PARITY.md records the reasoning.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(tp: int, num_devices: Optional[int] = None,
                 data_axis: str = "data") -> Mesh:
    """(data, model) mesh: tp-way model parallelism, rest data-parallel.

    The model axis is innermost so TP collectives ride neighbouring ICI
    links (jax.devices() enumerates nearest-first on TPU slices).
    """
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            # mirror make_mesh (mesh.py): erroring beats silently
            # building a smaller mesh than the operator asked for
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} JAX device(s) are visible")
        devs = devs[:num_devices]
    if len(devs) % tp:
        raise ValueError(f"{len(devs)} devices not divisible by tp={tp}")
    grid = np.asarray(devs).reshape(len(devs) // tp, tp)
    # the model axis is always named "model": the _RULES specs hardcode
    # it, so a configurable name would just be a latent KeyError
    return Mesh(grid, (data_axis, "model"))


# (path-suffix, partition spec builder) — first match wins. Specs are
# expressed against the model axis name; a rule is skipped (replicate)
# when the sharded dim doesn't divide the axis — see param_spec.
_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    (("gru_w_ih",), P("model", None)),
    (("gru_w_hh",), P("model", None)),
    (("gru_b_ih",), P("model")),
    (("gru_b_hh",), P("model")),
    (("conv_kernels",), P(None, "model")),
    (("mean_rho",), P("model")),
    (("mean_theta",), P("model")),
    (("precision_rho",), P("model")),
    (("precision_theta",), P("model")),
    (("wembed",), P("model", None)),
    (("v",), P(None, "model")),
    (("g",), P("model")),
    (("b",), P("model")),
)

# The single-letter v/g/b leaves exist only inside WeightNormDense
# modules (models/graph_vqa.py: edge_layer_* under the GraphLearner,
# out_1/out_2 classifier heads). Requiring that owner prefix stops the
# suffix rules from silently column-sharding any FUTURE parameter that
# happens to end in one of those names (ADVICE round 2).
_WEIGHT_NORM_OWNERS = ("edge_layer_", "out_")
_OWNER_SCOPED = frozenset({("v",), ("g",), ("b",)})


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
    return tuple(names)


def param_spec(path, leaf, mesh: Mesh) -> P:
    """Partition spec for one state leaf, by path suffix.

    A rule only applies when every sharded dim divides the mesh axis
    size (the standard Megatron-style constraint — jax.device_put
    rejects uneven shards). Leaves that don't divide replicate instead:
    e.g. the VQA answer vocab 3001 is prime, so the classifier stays
    replicated unless the vocab is padded to a multiple of tp upstream
    (data/preprocess can emit any n_answers).
    """
    names = _path_names(path)
    shape = np.shape(leaf)
    for suffix, spec in _RULES:
        if names[-len(suffix):] == suffix:
            if suffix in _OWNER_SCOPED and not (
                    len(names) >= 2 and
                    names[-2].startswith(_WEIGHT_NORM_OWNERS)):
                break  # v/g/b outside a weight-norm module -> replicate
            dims = tuple(spec)
            if len(shape) < len(dims):
                break  # rank mismatch (defensive) -> replicate
            for i, axis in enumerate(dims):
                if axis is not None and shape[i] % mesh.shape[axis]:
                    return P()  # indivisible dim -> replicate
            return spec
    return P()


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState (or params tree) on the 2-D mesh.

    Parameters and Adam moments follow the suffix rules above (the
    optimizer moment trees mirror the param tree, so the same suffixes
    match); scalars, unknown leaves and indivisible dims replicate.
    Drop-in replacement for parallel.replicate() when the mesh has a
    model axis.

    Placement goes through mesh.put_named: single-process it is a plain
    jax.device_put; under multi-controller JAX (a pod launch with tp>1)
    it switches to multihost.put_global, which materializes only this
    host's addressable shards — raw device_put would reject the global
    mesh's non-addressable devices (ADVICE round 3).
    """
    from vqa_project_tpu.parallel.mesh import put_named

    def put(path, leaf):
        return put_named(
            leaf, NamedSharding(mesh, param_spec(path, leaf, mesh)))

    return jax.tree_util.tree_map_with_path(put, state)
