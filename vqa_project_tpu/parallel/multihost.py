"""Multi-host (multi-process) SPMD support.

The reference is strictly single-process/single-GPU (SURVEY.md section 2:
no torch.distributed anywhere); this module is TPU-native surplus that
lets the same training loop run a multi-host pod slice (v5e-16 and up,
where one JAX process runs per host and `jax.devices()` spans hosts).

Design (multi-controller JAX, jax-ml.github.io/scaling-book recipe):

- every process runs the identical program; meshes are built over the
  GLOBAL device list, so the jitted train step and its GSPMD collectives
  are unchanged from the single-host case (ICI within a host, DCN across
  hosts is XLA's problem, not ours);
- host data feeding: the Batcher's RNG is seeded identically on every
  process, so all processes compute the same global batch row order.
  Each process materializes only its ADDRESSABLE shard of each global
  array via `jax.make_array_from_callback` (`put_global` below) — the
  callback slices the host batch with the shard index, so a process
  never touches rows destined for another host's chips. Index batches
  (the production device-cache mode) are a few KB of int32 per step, so
  recomputing the global order everywhere costs nothing;
- replicated leaves (params, optimizer state, the device feature cache)
  go through the same callback path: each process materializes its own
  replica copies from its local host value (identical across processes
  by construction: same checkpoint file / same dataset artifacts);
- only process 0 writes artifacts (checkpoints, metrics JSONL,
  result.json) — see `is_primary`.

Nothing here imports at TPU-init time; `maybe_initialize_distributed`
must run before the first `jax.devices()` call in a real pod launch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_FORCE_ENV = "VQAX_FORCE_GLOBAL_ARRAYS"


def maybe_initialize_distributed() -> bool:
    """Initialize multi-controller JAX when the launch env asks for it.

    Two activation paths (both no-ops in the common single-host run):
      VQAX_DIST=1                    -> jax.distributed.initialize() with
                                        TPU-pod auto-detection (each host
                                        discovers coordinator/rank from
                                        the TPU metadata server);
      VQAX_COORDINATOR=host:port     -> explicit coordinator, with
      VQAX_NUM_PROCESSES / VQAX_PROCESS_ID giving world size and rank
      (the CPU/GPU-cluster style launch).

    Returns True if initialize() was called (or already had been).
    Idempotent: harness entry points (cli/run.py, cli/medical.py) each
    call it defensively, and a program may drive several of them in one
    process — jax.distributed.initialize raises on the second call.
    """
    global _INITIALIZED_HERE
    coord = os.environ.get("VQAX_COORDINATOR")
    want = bool(coord) or os.environ.get("VQAX_DIST") == "1"
    if not want:
        return False
    if _distributed_client_up():
        return True
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VQAX_NUM_PROCESSES"]),
            process_id=int(os.environ["VQAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()
    _INITIALIZED_HERE = True
    return True


# primary already-initialized signal: set by THIS module's initialize
# call, so the idempotency guard keeps working even if the jax-internal
# probe below breaks on a jax upgrade
_INITIALIZED_HERE = False


def _distributed_client_up() -> bool:
    """True when jax.distributed.initialize already ran in this process."""
    if _INITIALIZED_HERE:
        return True
    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:
        import warnings

        # the probe is belt-and-braces for initialize() calls made
        # OUTSIDE this module; losing it must be loud, not a silent
        # 'already initialized' crash at the second entry point
        warnings.warn("jax._src.distributed.global_state probe failed; "
                      "relying on this module's own initialize tracking",
                      RuntimeWarning)
        return False


def is_multiprocess() -> bool:
    """True when global arrays must be assembled per-process.

    VQAX_FORCE_GLOBAL_ARRAYS=1 forces the make_array_from_callback path
    at process_count()==1 so tests and the driver dryrun can execute the
    multi-host assembly code without a real pod.
    """
    if os.environ.get(_FORCE_ENV) == "1":
        return True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns artifact writes (rank 0)."""
    return jax.process_index() == 0


def put_global(x, sharding) -> jax.Array:
    """Place a host value onto a (possibly cross-host) sharding.

    Unlike jax.device_put, this never requires non-addressable devices:
    each process materializes only the shards living on ITS devices, by
    slicing the host value with the shard's index. Works for replicated
    shardings (every slice is the whole array) and batch/table shardings
    (each host cuts out its block). The host value must be identical on
    every process — guaranteed here by seeding all Batcher RNGs alike
    and loading params/caches from the same artifacts.
    """
    if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys (state.rng) can't pass through numpy: place
        # the raw key data (trailing impl dims are unsharded under a
        # partial PartitionSpec) and re-wrap with the same impl
        impl = jax.random.key_impl(x)
        data = put_global(jax.random.key_data(x), sharding)
        return jax.random.wrap_key_data(data, impl=impl)
    x = np.asarray(x)
    # match device_put's dtype canonicalization (int64->int32 etc. with
    # x64 disabled); make_array_from_callback does not canonicalize, and
    # a dtype mismatch between the global aval and the shard buffers
    # would reinterpret bytes
    dt = jax.dtypes.canonicalize_dtype(x.dtype)
    if dt != x.dtype:
        x = x.astype(dt)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def fetch_global(x) -> np.ndarray:
    """np.asarray of a jax.Array whose shards may live on other hosts.

    Single-process: plain np.asarray. Multi-process: allgather the
    missing shards over the mesh first (eval prediction rows are batch-
    sharded, so each host only holds its chips' rows; result.json needs
    them all on the writing host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x,
                                                            tiled=True))
    return np.asarray(x)


def local_batch_rows(batch_size: int,
                     process_index: Optional[int] = None,
                     mesh=None, data_axis: Optional[str] = None) -> slice:
    """The slice of a global batch whose rows land on this host's chips.

    Debug/inspection helper only — the feeding itself goes through
    put_global and needs no explicit slice. With ``mesh`` given, the
    rows are derived from the ACTUAL batch sharding's per-device shard
    indices (authoritative even when mesh_utils.create_device_mesh
    reordered devices by torus topology, which can interleave hosts —
    ADVICE round 3); a non-contiguous ownership raises rather than
    mislabel rows. Without a mesh it assumes the process-ordered device
    list (true for raw jax.devices() meshes, NOT guaranteed for
    topology-ordered ones — pass the mesh on a real pod).
    """
    p = jax.process_index() if process_index is None else process_index
    if mesh is None:
        per = batch_size // jax.process_count()
        return slice(p * per, (p + 1) * per)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(data_axis or mesh.axis_names[0]))
    rows = set()
    for dev, idx in sh.devices_indices_map((batch_size,)).items():
        if dev.process_index != p:
            continue
        s = idx[0]
        rows.update(range(s.start or 0,
                          batch_size if s.stop is None else s.stop))
    if not rows:
        return slice(0, 0)
    lo, hi = min(rows), max(rows) + 1
    if len(rows) != hi - lo:
        raise ValueError(
            f"process {p} owns non-contiguous batch rows {sorted(rows)} "
            "on this mesh; no single slice describes them")
    return slice(lo, hi)
