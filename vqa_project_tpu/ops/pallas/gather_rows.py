"""HBM-speed row gather via Pallas scalar prefetch.

The device-resident feature cache serves every training step with a
row gather `table[rows]` (rows = the batch's image indices). XLA lowers
that gather into a serialized dynamic-slice loop whose cost GROWS with
the table size — measured on the v5e chip, gathering 256 rows of
(36, 2048) f32 (75 MB) takes ~1 ms from a 28 MB table but ~15 ms from a
4.8 GB table, ~50x off HBM speed. This kernel is the canonical TPU
embedding-lookup pattern instead: the row indices are SCALAR-PREFETCHED
so the BlockSpec index_map can address table blocks by row id, and
Mosaic double-buffers one DMA per grid step. Cost is the data movement
itself, independent of table size.

No VJP is defined: the feature table is data, not a parameter — no
gradient ever flows through the cache gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(rows_ref, tbl_ref, out_ref):
    del rows_ref  # consumed by the index_map, not the body
    out_ref[...] = tbl_ref[...]


def gather_rows(table: jax.Array, rows: jax.Array, *,
                interpret: bool | None = None) -> jax.Array:
    """table[rows] for a (N, K, F) table and (B,) int32 rows.

    One grid step DMAs one (1, K, F) row block, destination-indexed by
    the prefetched row id. Rows must be in-range (the cache layer clamps
    padded rows before calling). interpret=None auto-selects interpret
    mode off-TPU, so the train step stays runnable on the virtual CPU
    test mesh with the same code path.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = rows.shape[0]
    _, k, f = table.shape
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, k, f), lambda i, rows: (rows[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, k, f), lambda i, rows: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, f), table.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), table)
