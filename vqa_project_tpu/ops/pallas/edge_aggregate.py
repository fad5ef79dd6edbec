"""Fused Pallas TPU kernels: top-m mask + edge softmax + Gaussian kernel
weights + neighbourhood aggregation in one VMEM-resident pass — forward
AND hand-derived backward.

This is the fused "graph block" of the BASELINE.json north star: given
the learned adjacency, the polar pseudo-coordinates and the per-kernel
PROJECTED node features, it produces the convolved features without ever
materializing the (B, K, K, n_kernels) edge-weight tensor in HBM. The
grid is batch-tiled: one grid step processes `bt` images (a fori_loop
inside the kernel, so per-image temporaries like the (K, K, K) rank
broadcast never coexist); everything (rank computation, masked softmax,
Gaussian weights, n_kernels KxK matmuls) happens in VMEM.

Training runs TWO kernels per block: the forward saves tiny residuals
(normalized gaussian weights, clamped denominator — (1+n)·K² floats
per image) and _kernel_bwd computes all gradients from them with no
forward recompute. The math matches jax.vjp(edge_aggregate_reference)
term for term; edge_aggregate_reference() below IS the XLA path and
serves as the correctness oracle for both directions.

Top-m selection happens OUTSIDE the kernel (ops/neighbourhood.py's
masked_neighbourhood, shared with the XLA path): the kernel consumes
the selected (B, K, K) edge weights (softmaxed alpha or the 0/1 mask)
directly and its backward emits d(sel); XLA's autodiff then carries the
softmax VJP back to the adjacency. Round 2 computed selection IN-kernel
via a per-image (K, K, K) pairwise-rank broadcast — O(K³) VPU work per
image, serialized inside the kernel's fori_loop, and it ran TWICE per
step (once per conv) plus a duplicate softmax. Hoisting it costs one
extra (B, K, K) HBM read per conv (~0.04% of step bytes) and deletes
the kernel's dominant VPU stage (round-3 profile attack; VERDICT r2).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_project_tpu.ops.gaussian import gaussian_kernel_weights
from vqa_project_tpu.ops.neighbourhood import masked_neighbourhood

# the batch-tiled blocks sit near the default 16 MB scoped-VMEM limit
# (double-buffered (bt, K, nd) f32 blocks); v5e has 128 MB physical
# VMEM, so grant headroom explicitly
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _dot_precision(dtype):
    """f32 operands get exact f32 dots (Precision.HIGHEST), matching the
    XLA path's matmul_precision(); bf16 operands keep the fast default
    (HIGHEST is a no-op for bf16 inputs). Without this, Mosaic lowers
    f32 dots to one bf16 MXU pass — measured 3e-3 abs error at K=51
    f32 vs the XLA reference's 1e-6."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _pick_bt(b: int, target: int = 0) -> int:
    """Largest batch-tile <= target that divides b (grid must be exact).

    Default target 8 (VQAX_BT overrides for A/B). Swept on-chip at bs
    256/nd=2048: bt=8 -> 6108.9 us busy/step, bt=16 -> 6118.1 (wash),
    bt=4 -> 6152.7 (worse), bt=32 -> Mosaic VMEM stack OOM (56.7 MB
    needed vs the 48 MB grant). 8 is the sweet spot: big enough to
    amortize per-grid-step overhead, small enough that the ~12 MB
    double-buffered block set leaves stack headroom."""
    if not target:
        target = int(os.environ.get("VQAX_BT", "8"))
    bt = min(target, b)
    while b % bt:
        bt -= 1
    return bt


def _kbf() -> bool:
    """VQAX_KBF=1: the (B, K, nd) proj / cotangent operands cross the
    Pallas boundary TRANSPOSED to (K, B, nd).

    Why: XLA lays the surrounding projection GEMMs' (B, K, nd) outputs
    out as {2,0,1} — physically (K, B, nd) — while pallas_call demands
    default (row-major) operand layouts, so every GEMM->kernel edge pays
    a full HBM relayout copy (measured 86+59+134 us plus a 63 us spill
    at bs 256, ~5% of the step). Transposing the OPERAND instead makes
    the boundary a pure bitcast of the layout XLA already prefers; the
    kernel un-transposes per grid step in VMEM (jnp.swapaxes of a
    (K, bt, nd) block), which rides VMEM bandwidth instead of HBM.

    MEASURED NEGATIVE (kept for the record, default off): the optimized
    HLO confirms the relayout copies disappear (-113 MB/step), but the
    interleaved on-chip A/B ran ~8-15% SLOWER (clean pairwise ratios
    0.85/0.92 at bs 256) — Mosaic lowers the (K, bt, nd)->(bt, K, nd)
    swapaxes as a sublane shuffle across tiles that costs more than the
    HBM copies it saves, and it cannot be avoided with dot dimension
    numbers: tpu.matmul rejects a batch dim in the middle of an operand
    (probed on-chip, mosaic compile error).

    (The third angle — with_layout_constraint pinning the operands
    row-major AT the producer GEMMs so layout assignment folds the
    transpose into the GEMM epilogue instead of a standalone copy —
    was also profiled and was an exact no-op: 6638.0 vs 6638.8 us
    busy/step, same copies in the op list. XLA already treats the
    constraint as "insert a copy at the boundary", which is what it
    does anyway.)"""
    return os.environ.get("VQAX_KBF", "0") == "1"


def _proj_spec(k: int, bt: int, nd: int, kbf: bool):
    """BlockSpec for a (B, K, nd)-semantics operand, honouring KBF."""
    if kbf:
        return pl.BlockSpec((k, bt, nd), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((bt, k, nd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _load_bkn(ref, kbf: bool):
    """Load a proj-like block as (bt, K, nd) regardless of boundary form."""
    return jnp.swapaxes(ref[:], 0, 1) if kbf else ref[:]


def _gaussians_one(rho, theta, gp_ref, n_kernels: int):
    """Per-kernel Gaussian weights: ([w_n], clamped denom).

    Shape-polymorphic elementwise math: rho/theta may be one image's
    (K, K) planes or the whole batch-tile's (bt, K, K) — the kernels
    call it ONCE per grid step on the full tile so the VPU sees bt*K-row
    tiles instead of bt separate K-row dispatches.

    Reference semantics (layers.py:100-125): 1e-14 precision epsilons,
    wrapped theta distance, NaN-zeroing before the kernel-axis
    normalization; the denominator clamp at 1e-20 is the documented
    divergence (ops/gaussian.py)."""
    two_pi = jnp.float32(2.0 * math.pi)
    gws = []
    denom = jnp.zeros(rho.shape, jnp.float32)
    for n in range(n_kernels):
        mu_r = gp_ref[0, n]
        mu_t = gp_ref[1, n]
        pr = gp_ref[2, n]
        pt = gp_ref[3, n]
        w_r = jnp.exp(-0.5 * (rho - mu_r) ** 2 / (1e-14 + pr * pr))
        first = jnp.abs(theta - mu_t)
        second = jnp.abs(two_pi - first)
        dtheta = jnp.minimum(first, second)
        w_t = jnp.exp(-0.5 * dtheta * dtheta / (1e-14 + pt * pt))
        w = w_r * w_t
        w = jnp.where(jnp.isnan(w), 0.0, w)
        gws.append(w)
        denom = denom + w
    return gws, jnp.maximum(denom, 1e-20)


def _epilogue(acc, s, seed_ref, *, relu: bool, dropout_rate: float,
              bt: int = 1):
    """Fused activation tail: relu, then inverted dropout from the TPU
    PRNG seeded per image (seed_ref[s]). dropout implies relu here (the
    backward reconstructs BOTH masks from out>0 alone: out>0 iff the
    unit was kept AND positive, and dropped units contribute zero
    gradient regardless of sign)."""
    if relu or dropout_rate > 0:
        acc = jnp.maximum(acc, 0.0)
    if dropout_rate > 0:
        pltpu.prng_seed(seed_ref[pl.program_id(0) * bt + s])
        bits = pltpu.bitcast(
            pltpu.prng_random_bits(acc.shape), jnp.uint32)
        thresh = jnp.uint32(min(int(dropout_rate * 2.0 ** 32),
                                2 ** 32 - 1))
        keep = (bits >= thresh).astype(jnp.float32)
        acc = acc * keep * jnp.float32(1.0 / (1.0 - dropout_rate))
    return acc


def _tile_aggregate(w_all, proj_all, n_kernels: int, d: int):
    """(bt, n, K, K) edge weights x (bt, K, n*d) proj -> (bt, K, n*d)
    f32, one batched dot_general per kernel (batch dim = the image
    tile; 2*n MXU dispatches per grid step instead of 2*n*bt)."""
    prec = _dot_precision(proj_all.dtype)
    outs = []
    for n in range(n_kernels):
        p_n = proj_all[:, :, n * d:(n + 1) * d].astype(jnp.float32)
        outs.append(jax.lax.dot_general(
            w_all[:, n], p_n, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec))                           # (bt, K, d)
    return jnp.concatenate(outs, axis=-1)


def _kernel(sel_ref, pseudo_ref, proj_ref, gp_ref, *refs,
            n_kernels: int, d: int, bt: int, kbf: bool = False,
            relu: bool = False, dropout_rate: float = 0.0):
    """Inference forward: bt images per grid step, no residuals.

    Round-3 restructure: ALL elementwise work (gaussians, kernel-axis
    normalization, the sel multiply) runs ONCE per grid step on the
    whole (bt, ...) tile — the per-image fori_loop issues only the MXU
    dots and the epilogue. The old per-image structure dispatched
    bt * n_kernels tiny (K, K) VPU ops per stage, and dispatch overhead
    dominated the kernel (~1.1 ms of the 8 ms step at bs 256). The
    block edge weights route through a VMEM scratch because Mosaic
    cannot dynamically index VALUES by a loop var."""
    if dropout_rate > 0:
        seed_ref, out_ref, w_scr, acc_scr = refs
    else:
        seed_ref = acc_scr = None
        out_ref, w_scr = refs

    gws, denom = _gaussians_one(pseudo_ref[:, 0], pseudo_ref[:, 1],
                                gp_ref, n_kernels)     # n x (bt, K, K)
    w_scr[:] = sel_ref[:][:, None] * (jnp.stack(gws, axis=1)
                                      / denom[:, None])

    # batched dots over the whole image tile (one dot_general per
    # kernel); accumulate f32, store in the proj dtype (bf16 in the
    # compute policy): the step is HBM-bound and the f32 round trip of
    # the (B, K, nd) output + its downstream converts cost ~200 MB/step
    acc = _tile_aggregate(w_scr[:], _load_bkn(proj_ref, kbf),
                          n_kernels, d)
    if relu or dropout_rate > 0:
        acc = jnp.maximum(acc, 0.0)
    if dropout_rate > 0:
        # PRNG seeding is per image (deterministic under batch
        # re-slicing): loop only the dropout draw, from an f32 scratch
        # so the inverted scale rounds ONCE on the store
        acc_scr[:] = acc

        def body(s, carry):
            out_ref[s] = _epilogue(
                acc_scr[s], s, seed_ref, relu=False,
                dropout_rate=dropout_rate, bt=bt).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, bt, body, 0, unroll=False)
    else:
        out_ref[:] = acc.astype(out_ref.dtype)


def _kernel_res(sel_ref, pseudo_ref, proj_ref, gp_ref, *refs,
                n_kernels: int, d: int, bt: int, kbf: bool = False,
                relu: bool = False, dropout_rate: float = 0.0):
    """Training forward: also saves (normalized gaussian, denom).

    Same block-vectorized structure as _kernel; the residual refs double
    as the block stores (ghat_ref is written once per grid step and read
    back per image inside the dot loop)."""
    if dropout_rate > 0:
        seed_ref, out_ref, ghat_ref, denom_ref, w_scr, acc_scr = refs
    else:
        seed_ref = acc_scr = None
        out_ref, ghat_ref, denom_ref, w_scr = refs

    gws, denom = _gaussians_one(pseudo_ref[:, 0], pseudo_ref[:, 1],
                                gp_ref, n_kernels)
    denom_ref[:] = denom
    ghat = jnp.stack(gws, axis=1) / denom[:, None]     # (bt, n, K, K)
    ghat_ref[:] = ghat
    w_scr[:] = sel_ref[:][:, None] * ghat

    acc = _tile_aggregate(w_scr[:], _load_bkn(proj_ref, kbf),
                          n_kernels, d)
    if relu or dropout_rate > 0:
        acc = jnp.maximum(acc, 0.0)
    if dropout_rate > 0:
        acc_scr[:] = acc

        def body(s, carry):
            out_ref[s] = _epilogue(
                acc_scr[s], s, seed_ref, relu=False,
                dropout_rate=dropout_rate, bt=bt).astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, bt, body, 0, unroll=False)
    else:
        out_ref[:] = acc.astype(out_ref.dtype)


def _kernel_bwd(g_ref, sel_ref, ghat_ref, denom_ref, pseudo_ref,
                proj_ref, gp_ref, *refs,
                n_kernels: int, d: int, bt: int, kbf: bool = False,
                epilogue: bool = False, inv_keep: float = 1.0):
    """Hand-derived VJP of the fused graph block, fully in VMEM.

    Matches jax.vjp(edge_aggregate_reference) term by term:
      out_n = (sel * ghat_n) @ p_n
      dproj_n = (sel * ghat_n)^T @ g_n
      G_n    = g_n @ p_n^T                     (d out_n / d edge-weight)
      dsel   = sum_n G_n * ghat_n              (emitted; XLA carries the
               softmax VJP from sel back to the adjacency)
      dgw_n  = G_n * sel
      dw_n   = (dgw_n - ind * sum_m dgw_m * ghat_m) / denom
               (quotient rule through the kernel-axis normalization;
                ind = denominator not clamped at 1e-20)
      with w_n = ghat_n * denom (exact, incl. NaN-zeroed edges -> 0):
      drho  += dw_n * w_n * (-(rho - mu_r) / (1e-14 + pr^2))
      dtheta+= dw_n * w_n * (-D / (1e-14 + pt^2)) * dD/dtheta
      dmu/dprec accumulate the per-kernel sums of the same terms
    """
    two_pi = jnp.float32(2.0 * math.pi)
    if epilogue:
        out_ref = refs[0]
        refs = refs[1:]
    dsel_ref, dpseudo_ref, dproj_ref, dgp_ref = refs[:4]
    g_scr, w_scr, ge_scr = refs[4:]                    # VMEM scratch

    # phase 0 (block-vectorized): widen the cotangent IN VMEM — casting
    # at the XLA level forced a full f32 layout-copy of the (B, K, nd)
    # cotangent in HBM before the custom call (263 us at bs 256;
    # bf16->f32 is exact) — apply the activation epilogue, and form the
    # selected edge weights once for the whole tile.
    g_all = _load_bkn(g_ref, kbf).astype(jnp.float32)  # (bt, K, nd)
    if epilogue:
        # out>0 encodes relu AND dropout-keep; dropped/negative
        # units get exactly-zero gradient, kept ones the 1/(1-p)
        # inverted-dropout scale. Compare in f32 — the VPU has no
        # bf16 cmpf ("Target does not support this comparison").
        g_all = g_all * (out_ref[:].astype(jnp.float32) > 0
                         ).astype(jnp.float32) * jnp.float32(inv_keep)
    g_scr[:] = g_all
    w_scr[:] = sel_ref[:][:, None] * ghat_ref[:]       # (bt, n, K, K)

    # phase 1: the MXU dots, batched over the image tile via dot_general
    # batch dims (per-kernel python loop, whole-tile batched dot per
    # kernel — 2*n_kernels dots per grid step instead of 2*n*bt).
    # Dot dtype: f32 operands with HIGHEST even when proj is bf16 —
    # casting the edge weights / cotangent down to bf16 (single-pass
    # MXU, matching the XLA autodiff backward's precision) was
    # profiled a WASH (6112.1 vs 6108.9 us busy; the bwd kernels are
    # stream/overlap-bound, not dot-bound), so the extra precision is
    # free and stays.
    prec = _dot_precision(proj_ref.dtype)
    g_all = g_scr[:]                                   # (bt, K, nd) f32
    w_all = w_scr[:]                                   # (bt, n, K, K)
    proj_all = _load_bkn(proj_ref, kbf)
    dprojs = []
    for n in range(n_kernels):
        g_n = g_all[:, :, n * d:(n + 1) * d]           # (bt, K, d)
        p_n = proj_all[:, :, n * d:(n + 1) * d]
        dprojs.append(jax.lax.dot_general(
            w_all[:, n], g_n, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec))                           # (bt, K, d)
        # lax.dot_general needs matching dtypes; widening bf16 proj is
        # exact and matches jnp.dot's implicit promotion on the old path
        ge_scr[:, n] = jax.lax.dot_general(
            g_n, p_n.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                            # (bt, K, K)
    # computed in f32, stored in proj's dtype (mirrors the forward's
    # out_ref store; saves the downstream XLA convert + f32 copy)
    dproj_ref[:] = jnp.concatenate(dprojs, axis=-1
                                   ).astype(dproj_ref.dtype)

    # phase 2 (block-vectorized): d(edge weight) back through the
    # kernel-axis normalization and the gaussians to pseudo + gparams
    sel = sel_ref[:]                                   # (bt, K, K)
    ghat = ghat_ref[:]                                 # (bt, n, K, K)
    denom = denom_ref[:]
    rho = pseudo_ref[:, 0]
    theta = pseudo_ref[:, 1]
    ind = (denom > 1e-20).astype(jnp.float32)
    ge = ge_scr[:]                                     # (bt, n, K, K)
    dsel_ref[:] = jnp.sum(ge * ghat, axis=1)
    dgw = ge * sel[:, None]
    s_cross = jnp.sum(dgw * ghat, axis=1)              # (bt, K, K)

    drho = jnp.zeros_like(denom)
    dth = jnp.zeros_like(denom)
    dmu_r, dmu_t, dpr, dpt = [], [], [], []
    for n in range(n_kernels):
        mu_r = gp_ref[0, n]
        mu_t = gp_ref[1, n]
        pr = gp_ref[2, n]
        pt = gp_ref[3, n]
        inv_r = 1.0 / (1e-14 + pr * pr)
        inv_t = 1.0 / (1e-14 + pt * pt)
        dw_n = (dgw[:, n] - ind * s_cross) / denom
        w_n = ghat[:, n] * denom                       # exact w (NaN->0)
        dwn_wn = dw_n * w_n

        x_r = rho - mu_r
        drho = drho + dwn_wn * (-x_r * inv_r)
        dmu_r.append(jnp.sum(dwn_wn * x_r * inv_r))
        dpr.append(jnp.sum(dwn_wn * (x_r * x_r) * pr * inv_r * inv_r))

        first = jnp.abs(theta - mu_t)
        second = jnp.abs(two_pi - first)
        dist = jnp.minimum(first, second)
        # dD/dfirst: 1 on the first branch, -sign(2pi - first) on
        # the second (jnp.minimum routes ties to the first operand)
        dd_dfirst = jnp.where(first <= second, 1.0,
                              -jnp.sign(two_pi - first))
        sgn = jnp.sign(theta - mu_t)
        common_t = dwn_wn * (-dist * inv_t) * dd_dfirst * sgn
        dth = dth + common_t
        dmu_t.append(jnp.sum(-common_t))
        dpt.append(jnp.sum(dwn_wn * (dist * dist) * pt
                           * inv_t * inv_t))

    dpseudo_ref[:] = jnp.stack([drho, dth], axis=1)
    dgp_ref[0] = jnp.stack([jnp.stack(dmu_r), jnp.stack(dmu_t),
                            jnp.stack(dpr), jnp.stack(dpt)])


def _pallas_forward(sel, pseudo, proj, gparams, *,
                    interpret=False, save_residuals=False,
                    relu=False, dropout_rate=0.0, seeds=None):
    b, k, _ = sel.shape
    n_kernels = gparams.shape[1]
    nd = proj.shape[-1]
    d = nd // n_kernels
    bt = _pick_bt(b)
    kbf = _kbf()
    # pseudo arrives (B, K, K, 2); the kernel wants channel-major planes
    pseudo_cm = jnp.moveaxis(pseudo, -1, 1)            # (B, 2, K, K)

    in_specs = [
        pl.BlockSpec((bt, k, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 2, k, k), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _proj_spec(k, bt, nd, kbf),
        pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [sel.astype(jnp.float32), pseudo_cm.astype(jnp.float32),
            jnp.swapaxes(proj, 0, 1) if kbf else proj,
            gparams.astype(jnp.float32)]
    if dropout_rate > 0:
        assert seeds is not None, "in-kernel dropout needs per-image seeds"
        # full-array SMEM block (Mosaic only tiles rank-1 blocks at 128
        # granularity); the kernel indexes it by global image id
        in_specs.append(pl.BlockSpec((b,), lambda i: (0,),
                                     memory_space=pltpu.SMEM))
        args.append(seeds.astype(jnp.int32))
    ep = dict(relu=relu, dropout_rate=dropout_rate)
    scratch = [pltpu.VMEM((bt, n_kernels, k, k), jnp.float32)]
    if dropout_rate > 0:
        # f32 staging for the per-image dropout loop (single rounding)
        scratch.append(pltpu.VMEM((bt, k, nd), jnp.float32))
    if not save_residuals:
        kern = functools.partial(_kernel, n_kernels=n_kernels, d=d,
                                 bt=bt, kbf=kbf, **ep)
        return pl.pallas_call(
            kern,
            grid=(b // bt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, k, nd), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, k, nd), proj.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(*args)

    kern = functools.partial(_kernel_res, n_kernels=n_kernels, d=d,
                             bt=bt, kbf=kbf, **ep)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bt, k, nd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n_kernels, k, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, nd), proj.dtype),
            jax.ShapeDtypeStruct((b, n_kernels, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)


def _pallas_backward(g, sel, ghat, denom, pseudo_cm, proj, gparams, *,
                     interpret=False, out=None,
                     dropout_rate=0.0):
    b, k, _ = sel.shape
    n_kernels = gparams.shape[1]
    nd = proj.shape[-1]
    d = nd // n_kernels
    bt = _pick_bt(b)
    kbf = _kbf()
    epilogue = out is not None
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0 else 1.0

    kern = functools.partial(_kernel_bwd, n_kernels=n_kernels, d=d,
                             bt=bt, kbf=kbf,
                             epilogue=epilogue, inv_keep=inv_keep)
    dsel, dpseudo_cm, dproj, dgp_part = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            _proj_spec(k, bt, nd, kbf),
            pl.BlockSpec((bt, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n_kernels, k, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, k, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _proj_spec(k, bt, nd, kbf),
            pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + ([pl.BlockSpec((bt, k, nd), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)] if epilogue else []),
        out_specs=[
            pl.BlockSpec((bt, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 2, k, k), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k, nd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_kernels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, nd), proj.dtype),
            jax.ShapeDtypeStruct((b // bt, 4, n_kernels), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, k, nd), jnp.float32),          # g (widened)
            pltpu.VMEM((bt, n_kernels, k, k), jnp.float32),  # sel*ghat
            pltpu.VMEM((bt, n_kernels, k, k), jnp.float32),  # g_edge
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(jnp.swapaxes(g, 0, 1) if kbf else g,
      sel.astype(jnp.float32), ghat, denom,
      pseudo_cm,
      jnp.swapaxes(proj, 0, 1) if kbf else proj,
      gparams.astype(jnp.float32),
      *(() if not epilogue else (out,)))
    dpseudo = jnp.moveaxis(dpseudo_cm, 1, -1)          # (B, K, K, 2)
    dgparams = jnp.sum(dgp_part, axis=0)               # (4, n)
    # the cotangent dtype mirrors proj's (the model feeds bf16 proj in
    # the bf16 compute policy); the kernel computes the grad in f32 and
    # rounds once on the VMEM store — no XLA-level convert/copy pair
    return dsel, dpseudo, dproj, dgparams


def edge_aggregate_reference(adj, pseudo, proj, gparams, *, m, use_alpha):
    """XLA reference implementation (= the model's standard path, with
    features already projected): oracle for the kernel and its backward."""
    n_kernels = gparams.shape[1]
    alpha, mask = masked_neighbourhood(adj, m)
    sel = alpha if use_alpha else mask
    gw = gaussian_kernel_weights(pseudo, gparams[0], gparams[1],
                                 gparams[2], gparams[3])  # (B,K,K,n)
    edge_w = gw * sel[..., None]
    b, k, nd = proj.shape
    d = nd // n_kernels
    proj4 = proj.reshape(b, k, n_kernels, d)
    out = jnp.einsum("bijn,bjnd->bind", edge_w,
                     proj4.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, k, nd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_sel_aggregate_act(sel, pseudo, proj, gparams, seeds,
                            relu=False, dropout_rate=0.0,
                            interpret=False):
    """Differentiable fused aggregation over PRE-SELECTED edge weights.

    sel is the (B, K, K) selected edge weighting — masked_neighbourhood's
    softmaxed alpha (conv 1) or its 0/1 mask (conv 2); gradients flow
    back through sel, so XLA's autodiff carries the softmax VJP to the
    adjacency (and exactly-zero grads through the piecewise-constant
    mask).

    Forward and backward each run ONE Pallas kernel: the forward saves
    tiny residuals (normalized gaussian weights, clamped denom —
    (1+n)*K*K floats per image) and the backward (_kernel_bwd) computes
    all four gradients in VMEM from them, with no forward recompute and
    no other HBM intermediates. The math matches
    jax.vjp(edge_aggregate_reference) term for term.

    Args:
      sel:     (B, K, K) selected edge weights (fp32).
      pseudo:  (B, K, K, 2) polar pseudo-coordinates.
      proj:    (B, K, n_kernels*d) per-kernel projected node features.
      gparams: (4, n_kernels) stacked [mean_rho; mean_theta;
               precision_rho; precision_theta].
    Returns: (B, K, n_kernels*d) in proj.dtype.
    """
    return _pallas_forward(sel, pseudo, proj, gparams,
                           interpret=interpret,
                           relu=relu, dropout_rate=dropout_rate,
                           seeds=seeds)


def _fwd(sel, pseudo, proj, gparams, seeds, relu, dropout_rate,
         interpret):
    out, ghat, denom = _pallas_forward(
        sel, pseudo, proj, gparams,
        interpret=interpret, save_residuals=True,
        relu=relu, dropout_rate=dropout_rate, seeds=seeds)
    pseudo_cm = jnp.moveaxis(pseudo, -1, 1)
    epi_out = out if (relu or dropout_rate > 0) else None
    return out, (sel, ghat, denom, pseudo_cm, proj, gparams, epi_out)


def _bwd(relu, dropout_rate, interpret, res, g):
    del relu
    sel, ghat, denom, pseudo_cm, proj, gparams, epi_out = res
    grads = _pallas_backward(g, sel, ghat, denom, pseudo_cm, proj,
                             gparams,
                             interpret=interpret, out=epi_out,
                             dropout_rate=dropout_rate)
    return grads + (None,)  # seeds carry no gradient


fused_sel_aggregate_act.defvjp(_fwd, _bwd)


def fused_edge_aggregate_act(adj, pseudo, proj, gparams, seeds, m,
                             use_alpha, relu=False, dropout_rate=0.0,
                             interpret=False):
    """Fused graph block from the raw adjacency: top-m selection in XLA
    (masked_neighbourhood — shared with the non-Pallas path), the
    gaussian/aggregate/epilogue stage in the Pallas kernel."""
    alpha, mask = masked_neighbourhood(adj, m)
    return fused_sel_aggregate_act(alpha if use_alpha else mask,
                                   pseudo, proj, gparams, seeds,
                                   relu, dropout_rate, interpret)


def fused_edge_aggregate(adj, pseudo, proj, gparams, m, use_alpha,
                         interpret=False):
    """Plain fused graph block (no activation epilogue) — the oracle
    surface used by the tests; see fused_edge_aggregate_act."""
    return fused_edge_aggregate_act(adj, pseudo, proj, gparams, None,
                                    m, use_alpha, False, 0.0, interpret)
