"""Pallas TPU kernel: full GRU sequence scan in one kernel.

The XLA lax.scan GRU (ops/gru.py) round-trips the (B, H) hidden state
through HBM and pays loop overhead on every one of the T steps. This
kernel keeps the hidden state, the (H, 3H) recurrence weights and the
biases resident in VMEM across the whole sequence: grid=(batch_tiles, T)
with time as the minor axis, and the xp block is the only tensor
streamed per step (batch tiles keep VMEM under its 16 MB budget).

The input projection xp[t] = emb[t] @ W_ih^T + b_ih stays in XLA (one
big MXU matmul over all timesteps, ops/gru.py does the same).

Gate math matches torch.nn.GRU exactly (see ops/gru.py); masking freezes
the hidden state at each sequence's true length, so the final state
equals the packed-sequence result.

custom_vjp: the forward also emits the per-step hidden states hs, and
the backward is a hand-derived reverse-time sweep over the saved hs —
no forward recompute. Two implementations exist: the default XLA scan
(_bwd_xla_reference) and a Pallas reverse-sweep kernel
(VQAX_PALLAS_GRU_BWD=1; numerically identical, measured slower on v5e
TWICE: the round-2 version lost to per-step dhp HBM writes; the
round-3 version accumulates dW/db in VMEM scratch across the sweep
and streams dxp in the weight dtype — the exact VERDICT-r2 item-1a
design — and STILL measured 32.3-35.6k vs 36.7k qa/s end-to-end.
XLA's scan overlaps its per-step matmuls with the rest of the step's
op stream; a single serialized kernel cannot, and the GRU backward is
compute-dense enough that overlap wins. Kept for call-count-bound
regimes). Gradient equations:

    hp = h_prev @ Wt + b,  r = s(xr+hr), z = s(xz+hz), n = tanh(xn + r*hn)
    h = (1-z)*n + z*h_prev,  h_out = keep ? h : h_prev

    g_new = keep ? gh : 0 ;  pass = keep ? 0 : gh
    dz = g_new*(h_prev - n)            dn = g_new*(1-z)
    dn_pre = dn*(1-n^2)                dr = dn_pre*hn
    dhn = dn_pre*r                     dr_pre = dr*r*(1-r)
    dz_pre = dz*z*(1-z)                dhp = [dr_pre; dz_pre; dhn]
    dxp = [dr_pre; dz_pre; dn_pre]
    dh_prev = pass + g_new*z + dhp @ Wt^T
    dWt += h_prev^T @ dhp ;  db += sum_b dhp
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(qlen_ref, xp_ref, w_ref, b_ref,
                hfinal_ref, hs_ref, h_scr):
    t = pl.program_id(1)       # time is the minor grid axis
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h_prev = h_scr[:]                                  # (B, H) f32
    xp_t = xp_ref[0]                                   # (B, 3H) f32
    hp = jnp.dot(h_prev.astype(w_ref.dtype), w_ref[:],
                 preferred_element_type=jnp.float32) + b_ref[0]
    h = h_prev.shape[1]
    xr, xz, xn = xp_t[:, :h], xp_t[:, h:2 * h], xp_t[:, 2 * h:]
    hr, hz, hn = hp[:, :h], hp[:, h:2 * h], hp[:, 2 * h:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h_prev
    keep = qlen_ref[:] > t                             # (B, 1)
    h_out = jnp.where(keep, h_new, h_prev)
    h_scr[:] = h_out
    hs_ref[0] = h_out

    @pl.when(t == n_t - 1)
    def _():
        hfinal_ref[:] = h_out


def _batch_tile(bsz: int, row_bytes: int, fixed_bytes: int,
                budget: int = 13 * 1024 * 1024) -> int:
    """Largest batch tile (divisor of bsz, multiple of 8 unless equal to
    bsz — the Mosaic sublane constraint) fitting the VMEM budget.

    row_bytes: per-batch-row VMEM cost of all streamed/scratch buffers
    (double-buffering included by the caller); fixed_bytes: resident
    weights/bias. Default budget: 16 MB scoped VMEM minus compiler
    slack (callers raising vmem_limit_bytes pass a bigger budget)."""
    for bt in range(min(bsz, 256), 0, -1):
        if bsz % bt:
            continue
        if bt != bsz and bt % 8:
            continue
        if bt * row_bytes + fixed_bytes <= budget:
            return bt
    return bsz  # tiny batches: single tile (block == full array)


def _pallas_forward(xp, w_t, b, qlen, interpret):
    t, bsz, h3 = xp.shape
    h = h3 // 3
    # xp block x2 buffers (dtype as given: f32, or bf16 under
    # VQAX_GRU_XP_BF16) + hs out x2 + scratch + hfinal
    xp_bytes = jnp.dtype(xp.dtype).itemsize * 2
    bt = _batch_tile(bsz, row_bytes=h3 * xp_bytes + h * 16,
                     fixed_bytes=h * h3 * jnp.dtype(w_t.dtype).itemsize)
    nbt = bsz // bt
    qlen2 = qlen.reshape(bsz, 1).astype(jnp.int32)
    b2 = b.reshape(1, h3).astype(jnp.float32)
    # grid (batch tiles, T): T is the MINOR axis, so each batch tile runs
    # its entire time sweep consecutively and the hidden-state scratch
    # stays valid for the tile (reset at t == 0 in the kernel).
    return pl.pallas_call(
        _gru_kernel,
        grid=(nbt, t),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h3), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, h), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h), jnp.float32),
            jax.ShapeDtypeStruct((t, bsz, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, h), jnp.float32)],
        interpret=interpret,
    )(qlen2, xp, w_t, b2)  # xp streams in its own dtype (f32 or bf16)


def _gru_bwd_kernel(qlen_ref, xp_ref, hprev_ref, w_ref, b_ref, ghf_ref,
                    dxp_ref, dw_ref, db_ref, gh_scr, dw_scr, db_scr,
                    *, n_t: int):
    i = pl.program_id(1)                 # reverse sweep: t = T-1-i
    t = n_t - 1 - i

    @pl.when(i == 0)
    def _():
        gh_scr[:] = ghf_ref[:]
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    gh = gh_scr[:]
    xp_t = xp_ref[0]
    h_prev = hprev_ref[0]
    hp = jnp.dot(h_prev.astype(w_ref.dtype), w_ref[:],
                 preferred_element_type=jnp.float32) + b_ref[0]
    h = h_prev.shape[1]
    xr, xz, xn = xp_t[:, :h], xp_t[:, h:2 * h], xp_t[:, 2 * h:]
    hr, hz, hn = hp[:, :h], hp[:, h:2 * h], hp[:, 2 * h:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    keep = qlen_ref[:] > t
    g_new = jnp.where(keep, gh, 0.0)
    passthrough = jnp.where(keep, 0.0, gh)

    dz = g_new * (h_prev - n)
    dn = g_new * (1.0 - z)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)
    # dxp leaves in the weights' dtype (bf16 under the bf16 policy):
    # its only consumer is the bf16 W_ih VJP einsum — the f32 HBM
    # round trip was half of why the round-2 kernel lost its A/B
    dxp_ref[0] = jnp.concatenate([dr_pre, dz_pre, dn_pre],
                                 axis=-1).astype(dxp_ref.dtype)
    # dW/db accumulate in VMEM across the whole reverse sweep (the
    # round-2 kernel wrote per-step dhp to HBM and reduced in XLA —
    # ~150 MB of extra traffic at B=256; VERDICT r2 item 1a) and spill
    # once per batch tile.
    dw_scr[:] = dw_scr[:] + jax.lax.dot_general(
        h_prev, dhp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (H, 3H)
    db_scr[:] = db_scr[:] + jnp.sum(dhp, axis=0, keepdims=True)
    # dh_prev: contract dhp's 3H axis against w's 3H axis (no transpose
    # materialized — the MXU takes either contraction)
    gh_scr[:] = (
        passthrough + g_new * z
        + jax.lax.dot_general(
            dhp.astype(w_ref.dtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))

    @pl.when(i == n_t - 1)
    def _():
        dw_ref[0] = dw_scr[:]
        db_ref[0] = db_scr[:]


def _pallas_backward(xp, w_t, b, qlen, hs, gh_final, interpret):
    """Reverse-time Pallas sweep: dxp streams out (in the weight dtype),
    dW/db accumulate in VMEM scratch across the sweep and spill once per
    batch tile (tile partials summed in XLA)."""
    t, bsz, h3 = xp.shape
    h = h3 // 3
    # streamed per row: xp x2 + h_prev x2 (f32) + dxp x2 (w dtype) +
    # gh scratch + ghf; resident: weights + the (H, 3H) f32 dW
    # accumulator (+ its output block)
    wbytes = jnp.dtype(w_t.dtype).itemsize
    bt = _batch_tile(bsz, row_bytes=h3 * 16 + h3 * 2 * wbytes + h * 16,
                     fixed_bytes=h * h3 * (wbytes + 8) + h * h3 * 4,
                     budget=56 * 1024 * 1024)
    nbt = bsz // bt
    h_prevs = jnp.concatenate(
        [jnp.zeros((1, bsz, h), jnp.float32), hs[:-1]], axis=0)
    qlen2 = qlen.reshape(bsz, 1).astype(jnp.int32)
    b2 = b.reshape(1, h3).astype(jnp.float32)

    kern = functools.partial(_gru_bwd_kernel, n_t=t)
    dxp, dw_part, db_part = pl.pallas_call(
        kern,
        grid=(nbt, t),
        in_specs=[
            pl.BlockSpec((bt, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h3), lambda j, i: (t - 1 - i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, h), lambda j, i: (t - 1 - i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, h), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, h3), lambda j, i: (t - 1 - i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, h3), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h3), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, bsz, h3), w_t.dtype),
            jax.ShapeDtypeStruct((nbt, h, h3), jnp.float32),
            jax.ShapeDtypeStruct((nbt, 1, h3), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bt, h), jnp.float32),
                        pltpu.VMEM((h, h3), jnp.float32),
                        pltpu.VMEM((1, h3), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qlen2, xp.astype(jnp.float32), h_prevs, w_t, b2,
      gh_final.astype(jnp.float32))

    dw = jnp.sum(dw_part, axis=0)
    db = jnp.sum(db_part, axis=(0, 1))
    return dxp.astype(jnp.float32), dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_gru(xp, w_t, b, qlen, interpret=False):
    """GRU sequence scan; returns the final hidden state (B, H).

    Args:
      xp:   (T, B, 3H) precomputed input projections (incl. b_ih).
      w_t:  (H, 3H) transposed hidden weights (torch weight_hh_l0.T),
            any float dtype (bf16 recommended for the MXU).
      b:    (3H,) hidden bias b_hh.
      qlen: (B,) true sequence lengths.
    """
    h_final, _ = _pallas_forward(xp, w_t, b, qlen, interpret)
    return h_final


def _fwd(xp, w_t, b, qlen, interpret):
    h_final, hs = _pallas_forward(xp, w_t, b, qlen, interpret)
    return h_final, (xp, w_t, b, qlen, hs)


def _bwd(interpret, res, gh_final):
    # Default backward: the XLA reverse scan over the saved hidden
    # states. The Pallas backward kernel below is numerically identical
    # but measured SLOWER end-to-end on v5e (13.0 vs 10.3 ms fwd+grad at
    # B=256: the per-step dhp HBM writes + separate weight-grad einsum
    # outweigh the loop-overhead savings). Set VQAX_PALLAS_GRU_BWD=1 to
    # use it anyway.
    import os

    if os.environ.get("VQAX_PALLAS_GRU_BWD") == "1":
        xp, w_t, b, qlen, hs = res
        dxp, dw, db = _pallas_backward(xp, w_t, b, qlen, hs, gh_final,
                                       interpret)
        dqlen = np.zeros(qlen.shape, dtype=jax.dtypes.float0)
        return dxp, dw.astype(w_t.dtype), db.astype(b.dtype), dqlen
    return _bwd_xla_reference(res, gh_final)


def _bwd_xla_reference(res, gh_final):
    """XLA reverse-scan backward over the saved hidden states (default;
    also the oracle for the Pallas backward kernel).

    The weight/bias gradients are HOISTED out of the scan: the loop
    emits the per-step hidden-side pre-activation cotangent dhp and a
    single post-scan (T*B, H)x(T*B, 3H) einsum reduces it against
    h_prevs. Carrying dw inside the scan (the obvious formulation)
    round-trips a (H, 3H) f32 accumulator through the loop every step
    — ~25 MB/step of HBM traffic at H=1024 vs ~3 MB/step for the
    stacked dhp rows. Set VQAX_GRU_BWD=carry for the old formulation
    (kept for A/B)."""
    import os

    xp, w_t, b, qlen, hs = res
    t, bsz, h3 = xp.shape
    h = h3 // 3
    wd = w_t.dtype  # backward dots in the weight dtype, like the forward
    w32 = w_t.astype(jnp.float32)
    b32 = b.astype(jnp.float32).reshape(1, h3)
    qlen2 = qlen.reshape(bsz, 1).astype(jnp.int32)
    carry_dw = os.environ.get("VQAX_GRU_BWD") == "carry"

    # h_prev at step t is hs[t-1] (zeros at t=0)
    h_prevs = jnp.concatenate(
        [jnp.zeros((1, bsz, h), jnp.float32), hs[:-1]], axis=0)
    t_ids = jnp.arange(t, dtype=jnp.int32)

    def step(carry, inputs):
        if carry_dw:
            gh, dw, db = carry
        else:
            gh = carry
        xp_t, h_prev, t_idx = inputs
        # Recompute hp with the SAME dot dtype the forward kernel used
        # (h_prev cast to the weight dtype, f32 accumulate): bit-for-bit
        # the gate values the forward actually produced, and no f32
        # upcast of a bf16 weight matrix on the MXU.
        hp = jnp.dot(h_prev.astype(wd), w_t,
                     preferred_element_type=jnp.float32) + b32
        xr, xz, xn = xp_t[:, :h], xp_t[:, h:2 * h], xp_t[:, 2 * h:]
        hr, hz, hn = hp[:, :h], hp[:, h:2 * h], hp[:, 2 * h:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        keep = (qlen2 > t_idx)
        g_new = jnp.where(keep, gh, 0.0)
        passthrough = jnp.where(keep, 0.0, gh)

        dz = g_new * (h_prev - n)
        dn = g_new * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dhn = dn_pre * r
        dr_pre = dr * r * (1.0 - r)
        dz_pre = dz * z * (1.0 - z)
        dhp = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # (B,3H)
        dxp_t = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)

        dh_prev = (passthrough + g_new * z
                   + jnp.dot(dhp.astype(wd), w_t.T,
                             preferred_element_type=jnp.float32))
        if carry_dw:
            dw = dw + jnp.dot(h_prev.T, dhp,
                              preferred_element_type=jnp.float32)
            db = db + jnp.sum(dhp, axis=0)
            return (dh_prev, dw, db), dxp_t
        # Stack dhp in the weight dtype: halves the stacked-rows HBM
        # traffic under bf16; dw still accumulates in f32 via the
        # post-scan einsum's preferred_element_type.
        return dh_prev, (dxp_t, dhp.astype(wd))

    # The reverse scan is FULLY unrolled for short sequences (default;
    # VQAX_GRU_BWD_UNROLL=N overrides, 1 = keep the while loop):
    # straight-line code drops the while-loop overhead and lets XLA
    # overlap step t's elementwise chain with the neighbouring steps'
    # MXU work — the serial dh dependency bounds the schedule at
    # 2 GEMMs/step (~16 us), but the while ran ~30 us/step. Measured
    # (op profile, bs 256, T=16): full unroll 6109.0 us busy/step vs
    # 6311.7 with the while (-203 us); PARTIAL unroll=4 is WORSE than
    # the plain while (6427.3 — the bigger loop body schedules worse
    # without removing the loop). Hence: full unroll iff T <= 32,
    # plain scan otherwise. Semantics are identical either way.
    unroll_env = os.environ.get("VQAX_GRU_BWD_UNROLL", "")
    unroll = int(unroll_env) if unroll_env else (t if t <= 32 else 1)
    if carry_dw:
        init = (gh_final.astype(jnp.float32),
                jnp.zeros((h, h3), jnp.float32),
                jnp.zeros((h3,), jnp.float32))
        (dh0, dw, db), dxp = jax.lax.scan(
            step, init, (xp.astype(jnp.float32), h_prevs, t_ids),
            reverse=True, unroll=unroll)
    else:
        dh0, (dxp, dhps) = jax.lax.scan(
            step, gh_final.astype(jnp.float32),
            (xp.astype(jnp.float32), h_prevs, t_ids), reverse=True,
            unroll=unroll)
        dw = jnp.einsum("tbh,tbg->hg", h_prevs.astype(wd), dhps,
                        preferred_element_type=jnp.float32)
        db = jnp.sum(dhps.astype(jnp.float32), axis=(0, 1))
    del dh0  # initial state is a constant zero
    dqlen = np.zeros(qlen.shape, dtype=jax.dtypes.float0)
    return dxp, dw.astype(w_t.dtype), db.astype(b.dtype), dqlen


pallas_gru.defvjp(_fwd, _bwd)


def gru_encode_pallas(emb, qlen, w_ih, w_hh, b_ih, b_hh, *,
                      compute_dtype=jnp.bfloat16,
                      interpret=False) -> jnp.ndarray:
    """Drop-in replacement for ops.gru.gru_encode using the Pallas scan.

    The hoisted input projection runs in XLA; the recurrence runs in the
    kernel. Same signature/semantics as gru_encode.
    """
    from vqa_project_tpu.ops.graph_conv import matmul_precision

    prec = matmul_precision(compute_dtype)
    xp = (
        jnp.einsum("bte,ge->btg", emb.astype(compute_dtype),
                   w_ih.astype(compute_dtype),
                   preferred_element_type=jnp.float32, precision=prec)
        + b_ih.astype(jnp.float32)
    )
    xp = jnp.swapaxes(xp, 0, 1)                     # (T, B, 3H)
    # VQAX_GRU_XP_BF16=1 stores/streams the hoisted projection in the
    # compute dtype instead of f32 — the (T, B, 3H) tensor is ~50 MB at
    # bench dims and crosses HBM three times (write, fwd read, bwd
    # read). Off by default: the interleaved on-chip A/B measured a
    # WASH (4 pairs, B/A median 0.996, ratios 0.988-1.005 — the saved
    # bytes hide behind other pipeline stages), and it rounds the gate
    # PRE-ACTIVATIONS to bf16, a numerics cost with no measured payoff.
    import os

    if os.environ.get("VQAX_GRU_XP_BF16") == "1":
        xp = xp.astype(compute_dtype)
    w_t = jnp.swapaxes(w_hh, 0, 1).astype(compute_dtype)
    return pallas_gru(xp, w_t, b_hh, qlen.astype(jnp.int32), interpret)
