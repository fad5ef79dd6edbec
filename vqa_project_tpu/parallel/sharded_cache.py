"""Mesh-sharded device-resident feature cache.

The packed VQA v2 trainval table (~123k images x 36 x 2048 fp32 = 36 GB)
exceeds one v5e chip's HBM but fits comfortably sharded across a v5e-8
(~4.5 GB/chip). This module keeps the table sharded on the image axis
with NamedSharding(P(axis)) and serves per-step gathers with ZERO
cross-chip traffic: the Batcher's locality mode (Batcher(partitions=...))
builds every global batch so that the rows each chip's batch shard needs
are exactly the rows that chip owns, and the gather is a shard_map over
local indices.

This trades perfectly-uniform batch shuffling for communication-free
ingest: each global batch draws B/n_chips samples from every shard's
question pool (pools are reshuffled every epoch). For this model family
(i.i.d. samples, no curriculum) the statistical effect is negligible,
and the alternative — a reduce-scatter of (B, K, 2052) every step — is
pure overhead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


class ShardedFeatureCache:
    """Features+boxes sharded over the mesh's data axis (image axis 0)."""

    def __init__(self, features: jax.Array, boxes: jax.Array,
                 mesh: Mesh, axis: str, shard_size: int, n_images: int):
        self.features = features      # (n_padded, K, F) sharded on axis 0
        self.boxes = boxes            # (n_padded, K, 4) sharded on axis 0
        self.mesh = mesh
        self.axis = axis
        self.shard_size = shard_size  # images per chip
        self.n_images = n_images      # true (unpadded) count

    @classmethod
    def build(cls, store, mesh: Mesh, axis: str = "data",
              dtype=np.float32) -> "ShardedFeatureCache":
        n_chips = mesh.devices.size
        feats = np.asarray(store.features)
        boxes = np.asarray(store.boxes)
        n = feats.shape[0]
        shard = -(-n // n_chips)
        pad = shard * n_chips - n
        if pad:
            feats = np.concatenate(
                [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
            boxes = np.concatenate(
                [boxes, np.zeros((pad,) + boxes.shape[1:], boxes.dtype)])
        if np.dtype(dtype) != feats.dtype:
            feats = feats.astype(dtype)
        sh = NamedSharding(mesh, P(axis))
        from vqa_project_tpu.parallel.mesh import put_named

        return cls(
            put_named(feats, sh),
            put_named(boxes, sh),
            mesh, axis, shard, n)

    def partitions(self) -> np.ndarray:
        """Chip id owning each (true) image row — feed to
        Batcher(partitions=partitions[table.image_row])."""
        return (np.arange(self.n_images) // self.shard_size).astype(
            np.int32)

    def gather_fn(self, pallas_gather: bool = False):
        """Returns gather(features, boxes, rows) -> (features, boxes)
        batch pair, usable inside jit. rows must be locality-consistent:
        the i-th batch shard's rows belong to chip i. Returned as a PAIR
        in the stored dtypes (no f32 round trip — the model concatenates
        in its compute dtype and reads pseudo-coords from the f32
        boxes). pallas_gather serves the per-chip feature gather with
        the scalar-prefetch DMA kernel (ops/pallas/gather_rows.py);
        opt-in — measured end-to-end it does NOT beat XLA's fused take
        (see TrainConfig.pallas_gather), but it keeps the whole
        sharded-cache path drivable through the Pallas code path."""
        axis = self.axis
        shard_size = self.shard_size
        if pallas_gather:
            from vqa_project_tpu.ops.pallas.gather_rows import gather_rows

        def _local(table_f, table_b, rows):
            idx = jax.lax.axis_index(axis)
            # clamp: padded (mask=0) rows of a locality batch may carry a
            # foreign index; out-of-range gathers would fill with NaN,
            # and NaN features poison shared-parameter GRADIENTS even
            # under a masked loss (NaN * 0 = NaN in the backward). A
            # clamped row is garbage-but-finite, and the masked loss
            # then gives it an exactly-zero gradient contribution.
            local = jnp.clip(rows - idx * shard_size, 0, shard_size - 1)
            if pallas_gather:
                f = gather_rows(table_f, local)
            else:
                # local is clipped above, so "clip" is free and skips
                # XLA's fill-mode select + bounds machinery
                f = jnp.take(table_f, local, axis=0, mode="clip")
            b = jnp.take(table_b, local, axis=0, mode="clip")
            return f, b

        kwargs = {}
        if pallas_gather:
            # pallas_call's out_shape carries no varying-mesh-axes
            # annotation, which shard_map's vma checker (jax>=0.7)
            # rejects; the specs below already pin the partitioning.
            kwargs["check_vma"] = False
        return shard_map(
            _local, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)), **kwargs)
