"""Train state, LR schedule, and checkpointing.

Checkpoint parity targets (/root/reference):
- the single canonical checkpoint replaces the reference's two coexisting
  formats (full dict in run.py:176-181 vs bare state_dict in utils.py:44);
  it always carries params + opt state + step/epoch + rng + config;
- reference filename convention `vqa_{n_obj}_{n_kernels}_{neigh}_{acc}.pt`
  (run.py:469-470) is preserved by the harnesses;
- PyTorch state_dicts from the reference can be imported for parity
  validation via models/torch_import.py.

Serialization is flax msgpack in a single file — no external service, safe
to torch-free environments.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqa_project_tpu.config import ModelConfig, TrainConfig


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray        # scalar int32
    rng: jax.Array           # PRNG key (dropout)


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """MultiStepLR equivalent: lr * gamma at each milestone epoch
    (reference run.py:188: milestones=[30], gamma=0.5)."""
    boundaries = {
        int(m) * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam with the MultiStep schedule (run.py:172,188). torch Adam
    defaults (betas 0.9/0.999, eps 1e-8) match optax; adam_mu_dtype /
    adam_nu_dtype optionally store the moments in bfloat16 (see
    config.py)."""
    sched = make_lr_schedule(cfg, max(steps_per_epoch, 1))
    mu_dtype = getattr(cfg, "adam_mu_dtype", "float32")
    tx = optax.adam(learning_rate=sched, mu_dtype=mu_dtype)
    nu_dtype = getattr(cfg, "adam_nu_dtype", "float32")
    if nu_dtype != "float32":
        tx = _with_nu_dtype(tx, jnp.dtype(nu_dtype))
    return tx


def _with_nu_dtype(inner, nu_dtype):
    """Store Adam's second moment in `nu_dtype` without changing the
    update math: the stored nu is upcast to f32 before the wrapped
    transform's exact step and the fresh f32 nu rounded back down for
    storage. optax.adam has no nu_dtype (only mu_dtype), so this wraps
    the whole chain and rewrites the ScaleByAdamState nodes in place."""
    def _map_nu(state, fn):
        return jax.tree.map(
            lambda s: (s._replace(nu=jax.tree.map(fn, s.nu))
                       if isinstance(s, optax.ScaleByAdamState) else s),
            state,
            is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))

    def init(params):
        return _map_nu(inner.init(params),
                       lambda x: x.astype(nu_dtype))

    def update(updates, state, params=None):
        st = _map_nu(state, lambda x: x.astype(jnp.float32))
        new_updates, new_state = inner.update(updates, st, params)
        return new_updates, _map_nu(new_state,
                                    lambda x: x.astype(nu_dtype))

    return optax.GradientTransformation(init, update)


def create_train_state(model, model_cfg: ModelConfig, tx,
                       sample_batch: Dict[str, np.ndarray],
                       seed: int = 1000) -> TrainState:
    # Param init keeps threefry (bit-identical draws to every earlier
    # round for a given seed); the TRAINING rng is an rbg key — the
    # per-step dropout masks (the (B, K, 2052) feature dropout alone
    # needs ~19M random bits) then generate via the TPU's hardware RNG
    # instead of a threefry fusion, several hundred us of the bs-256
    # step (round-3 profile). Statistically equivalent dropout.
    init_rng, _ = jax.random.split(jax.random.key(seed))
    drop_rng = jax.random.key(seed, impl="rbg")
    params = model.init(
        init_rng,
        jnp.asarray(sample_batch["question"]),
        jnp.asarray(sample_batch["image"]),
        jnp.asarray(sample_batch["qlen"]),
    )
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=drop_rng,
    )


# ---------------- checkpoint IO ----------------

_ASYNC_SAVES: list = []


def async_save_checkpoint(path: str, state: TrainState, *,
                          epoch: int = 0,
                          extra: Optional[dict] = None) -> None:
    """Non-blocking checkpoint save: device_get happens on the caller
    (cheap handles; real D2H overlaps), serialization + disk write run in
    a daemon thread so the train loop keeps stepping. Call
    wait_for_async_saves() before exiting."""
    import threading

    host_state = TrainState(
        params=jax.device_get(state.params),
        opt_state=jax.device_get(state.opt_state),
        step=jax.device_get(state.step),
        rng=state.rng,
    )
    th = threading.Thread(
        target=save_checkpoint,
        args=(path, host_state),
        kwargs=dict(epoch=epoch, extra=extra),
        daemon=True)
    th.start()
    _ASYNC_SAVES.append(th)


def wait_for_async_saves() -> None:
    while _ASYNC_SAVES:
        _ASYNC_SAVES.pop().join()


def save_checkpoint(path: str, state: TrainState, *,
                    epoch: int = 0, extra: Optional[dict] = None) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(epoch),
        "rng": jax.device_get(jax.random.key_data(state.rng)),
        "extra": extra or {},
    }
    def to_np(x):
        # leave python scalars/strings alone; msgpack handles them natively
        if isinstance(x, (str, bytes, int, float, bool)) or x is None:
            return x
        return np.asarray(x)

    blob = flax.serialization.msgpack_serialize(
        jax.tree.map(to_np, _to_pure(payload)))
    # tmp + os.replace: mid-epoch preemption resume overwrites the same
    # {name}_{ep+1}.ckpt repeatedly — a preemption mid-write (the exact
    # scenario resume targets) must not corrupt the newest checkpoint.
    # The temp name must be unique PER CALL: two concurrent
    # async_save_checkpoint calls for the same path would interleave
    # writes into a shared path+'.tmp' and publish garbage.
    import tempfile

    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".", suffix=".tmp",
        dir=os.path.dirname(os.path.abspath(path)))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path


def is_torch_file(path: str) -> bool:
    """Sniff torch.save output: zip archives start with PK, legacy
    pickles with the 0x80 PROTO opcode + a small protocol byte. Our own
    msgpack checkpoints start with a fixmap whose second byte is a key
    string marker (>= 0xa0), so the two never collide in practice."""
    with open(path, "rb") as f:
        head = f.read(2)
    return head[:2] == b"PK" or (len(head) == 2 and head[0] == 0x80
                                 and head[1] < 0x08)


def load_checkpoint(path: str, state: Optional[TrainState] = None
                    ) -> Tuple[dict, Optional[TrainState]]:
    """Load a checkpoint; if a template TrainState is given, restore into
    it (shape-checked) and return (payload, new_state).

    Reference torch .pt files (both on-disk formats, utils.py:34-44 and
    run.py:176-181) are detected by sniffing and imported via
    models/torch_import — so every checkpoint consumer (--eval/--test,
    plot, serve) accepts the reference's published checkpoints directly,
    not just fit's resume path. Torch payloads carry params (+ epoch for
    the full-dict format) but no optax state; resuming TRAINING from a
    .pt goes through fit's _resume_checkpoint, which also splices the
    Adam moments."""
    if is_torch_file(path):
        from vqa_project_tpu.models.torch_import import \
            load_torch_checkpoint

        # load_torch_checkpoint returns the tree aligned with
        # state.params (variables dict, 'params' collection included);
        # wrap it under the same "params" payload key msgpack uses
        payload = {"params": load_torch_checkpoint(path)}
        new_state = None
        if state is not None:
            params = jax.tree.map(
                lambda t, p: jnp.asarray(p, t.dtype),
                state.params, payload["params"])
            new_state = state.replace(params=params)
        return payload, new_state
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    _migrate_conv_kernels(payload)
    new_state = None
    if state is not None:
        params = flax.serialization.from_state_dict(
            state.params, payload["params"])
        opt_state = flax.serialization.from_state_dict(
            state.opt_state, payload["opt_state"])
        # from_state_dict restores STORED dtypes; normalize to the
        # template's so a checkpoint written under a different
        # adam_mu_dtype resumes in the configured dtype (and the jitted
        # step keeps one compiled signature)
        opt_state = jax.tree.map(
            lambda t, s: (jnp.asarray(s, t.dtype)
                          if hasattr(t, "dtype") else s),
            state.opt_state, opt_state)
        rng_data = jnp.asarray(payload["rng"])
        # key impl from the stored data width: rbg carries (4,) uint32,
        # legacy threefry checkpoints (2,) — both resume bit-exactly
        rng = jax.random.wrap_key_data(
            rng_data, impl="rbg" if rng_data.shape[-1] == 4
            else "threefry2x32")
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.asarray(payload["step"], jnp.int32),
            rng=rng,
        )
    return payload, new_state


def _to_pure(tree):
    """Convert optax NamedTuples etc. into plain serializable containers."""
    return flax.serialization.to_state_dict(tree)


def _migrate_conv_kernels(tree) -> None:
    """In-place: legacy (n, in, d) conv_kernels -> fused (in, n*d).

    Checkpoints written before the round-3 plain-GEMM projection layout
    stored the per-kernel projections stacked; the fused matrix with
    column block n*d:(n+1)*d == kernel n holds the identical weights
    (transpose + reshape), so old checkpoints — including their Adam
    moments, which mirror the param tree — keep loading bit-for-bit."""
    if not isinstance(tree, dict):
        return
    for key, val in tree.items():
        if (key == "conv_kernels" and hasattr(val, "ndim")
                and val.ndim == 3):
            n, in_dim, d = val.shape
            tree[key] = np.asarray(val).transpose(1, 0, 2).reshape(
                in_dim, n * d)
        else:
            _migrate_conv_kernels(val)
