"""Device mesh construction and batch/parameter sharding.

This is the net-new communication layer relative to the single-GPU
reference (SURVEY.md section 5: DataParallel exists there only as
commented-out code, run.py:387-390). Design:

- a 1-D ``data`` mesh over all chips (v5e-8 target); batches are sharded
  on the leading axis with NamedSharding, parameters and optimizer state
  are replicated;
- the train step is a plain jit over these shardings — XLA inserts the
  gradient all-reduce (psum over ICI) automatically under SPMD, so there
  is no hand-written collective on the data path;
- the same code runs on 1 real TPU chip, N virtual CPU devices
  (xla_force_host_platform_device_count) and a real pod slice.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first num_devices devices.

    Device order goes through mesh_utils.create_device_mesh when the
    mesh spans all devices: on a real TPU slice that orders chips by
    torus coordinates so the DP all-reduce ring rides neighbouring ICI
    links (a no-op reshape on CPU/single-chip). Falls back to raw
    jax.devices() order for partial meshes or backends the helper
    doesn't know."""
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            # erroring beats the silent single-chip fallback: an operator
            # asking for --num_devices 8 on a 1-chip host must learn the
            # batches are NOT sharding, not discover it in a profile
            raise ValueError(
                f"requested a {num_devices}-device mesh but only "
                f"{len(devs)} JAX device(s) are visible")
        devs = devs[:num_devices]
    if len(devs) == jax.device_count() and len(devs) > 1:
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh(
                (len(devs),), devices=devs), (axis,))
        except Exception:
            pass
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_named(x, sh: NamedSharding) -> jax.Array:
    """Place one host array onto a NamedSharding, multi-host aware.

    Single-process (the common case, incl. the tunneled real chip): a
    plain jax.device_put — the proven fast path. Multi-process (or
    VQAX_FORCE_GLOBAL_ARRAYS=1): parallel.multihost.put_global, which
    materializes only this host's addressable shards."""
    from vqa_project_tpu.parallel import multihost

    if multihost.is_multiprocess():
        return multihost.put_global(x, sh)
    return jax.device_put(x, sh)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                axis: str = "data") -> Dict[str, jax.Array]:
    """Place a host batch with the leading axis split across chips.

    The batch size must be divisible by the mesh size (the Batcher pads
    final batches to a fixed size, so this holds by construction when
    batch_size % n_devices == 0).
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: put_named(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    (A VQAX_EMB_ROWMAJOR variant that committed the wembed leaves with
    an explicit row-major Format here was tried and was a no-op: jit
    relayouts committed inputs to its auto-chosen entry layout instead
    of specializing on them — the on-chip profile showed the entry
    layouts and the Adam relayout copies unchanged. The working lever
    is constraining the embedding GRADIENT's layout inside the step;
    see train/steps.py VQAX_EMB_GRAD_COLMAJOR.)"""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: put_named(x, sh), tree)
