"""ONE Pallas kernel per direction for the ENTIRE graph block.

The model's graph block is: per-kernel projection 1 -> Gaussian
aggregation 1 (alpha edges) -> relu -> dropout -> projection 2 ->
aggregation 2 (mask edges) -> relu. edge_aggregate.py fuses each
aggregation; this module fuses the WHOLE chain, projections included:

- the (n, F, d) projection weights stay VMEM-RESIDENT across grid
  steps (constant index_map), so the batch streams through them once;
- the inter-conv activations (proj1, h1 pre-states, proj2) never
  round-trip HBM in the forward, and the backward recomputes proj1/2
  from the saved h1/feats instead of loading them (~0.3 ms of MXU
  recompute replaces ~1.4 ms of serialized XLA projection fusions +
  weight-grad layout copies, measured via the op-level profile);
- weight gradients accumulate in VMEM across grid steps into
  revisited output blocks (TPU grids are sequential).

Gradient semantics match chaining two edge_aggregate blocks exactly:
conv1 backprops through the alpha softmax into the adjacency, conv2's
0/1 mask is piecewise constant (zero adjacency gradient), pseudo and
per-conv Gaussian parameters get both convs' contributions, and the
relu/dropout masks are reconstructed from the saved activations
(h1 > 0, out2 > 0 — see edge_aggregate._epilogue).

Used by the model on real TPUs; the interpret path (virtual CPU mesh)
keeps the two-kernel formulation (its in-kernel dropout needs the TPU
PRNG). fused_graph_block_reference() chains the XLA ops and is the
correctness oracle for both directions.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_project_tpu.ops.pallas.edge_aggregate import (
    _dot_precision,
    _epilogue,
    _gaussians_one,
    _pick_bt,
    edge_aggregate_reference,
)

_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=112 * 1024 * 1024)

_TWO_PI = 2.0 * math.pi


def _select_both(adj, m: int):
    """(mask, alpha) from ONE in-kernel pairwise-rank computation.

    Note: the per-conv kernels (edge_aggregate.py) hoisted selection out
    to XLA's masked_neighbourhood in round 3; this merged-block kernel
    keeps it in-kernel because it consumes the raw adjacency directly."""
    k = adj.shape[-1]
    beats = (adj[:, :, None] > adj[:, None, :])
    jp = jax.lax.broadcasted_iota(jnp.int32, (k, k, k), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, k, k), 2)
    ties = (adj[:, :, None] == adj[:, None, :]) & (jp < jj)
    rank = jnp.sum((beats | ties).astype(jnp.float32), axis=1)
    mask = (rank < float(m)).astype(jnp.float32)
    neg = jnp.float32(-1e30)
    masked_adj = jnp.where(mask > 0, adj, neg)
    rowmax = jnp.max(masked_adj, axis=-1, keepdims=True)
    ex = jnp.exp(masked_adj - rowmax) * mask
    alpha = ex / jnp.sum(ex, axis=-1, keepdims=True)
    return mask, alpha


def _block_fwd_kernel(adj_ref, pseudo_ref, feats_ref, w1_ref, w2_ref,
                      gp1_ref, gp2_ref, *refs,
                      m: int, n_kernels: int, d1: int, d2: int, bt: int,
                      dropout_rate: float):
    seed_ref = refs[0] if dropout_rate > 0 else None
    (out_ref, h1_ref, sel_ref, mask_ref, ghat1_ref, ghat2_ref,
     den1_ref, den2_ref) = refs[-9:-1]
    proj_scr = refs[-1]                      # (bt, K, nd1) f32 scratch
    prec = _dot_precision(feats_ref.dtype)
    k = adj_ref.shape[1]

    # tile-level projection 1: (bt*K, F1) @ (F1, d1) keeps the MXU fed
    # (per-image 36-row dots starve it — measured 18k vs 30k qa/s).
    # Mosaic can't dynamic-slice VALUES by the loop index, so the tile
    # results land in a VMEM scratch and the per-image loops index IT.
    ftile = feats_ref[...].reshape(bt * k, -1)
    proj_scr[...] = jnp.concatenate(
        [jnp.dot(ftile, w1_ref[n], preferred_element_type=jnp.float32,
                 precision=prec) for n in range(n_kernels)],
        axis=-1).reshape(bt, k, n_kernels * d1)

    def body1(s, carry):
        adj = adj_ref[s]
        ps = pseudo_ref[s]
        mask, alpha = _select_both(adj, m)
        sel_ref[s] = alpha
        mask_ref[s] = mask
        gws1, den1 = _gaussians_one(ps[0], ps[1], gp1_ref, n_kernels)
        den1_ref[s] = den1
        proj = proj_scr[s]
        outs, ghats = [], []
        for n in range(n_kernels):
            ghat_n = gws1[n] / den1
            ghats.append(ghat_n)
            p_n = proj[:, n * d1:(n + 1) * d1]
            outs.append(jnp.dot((alpha * ghat_n).astype(p_n.dtype), p_n,
                                preferred_element_type=jnp.float32,
                                precision=prec))
        ghat1_ref[s] = jnp.stack(ghats)
        h1 = _epilogue(jnp.concatenate(outs, axis=-1), s, seed_ref,
                       relu=True, dropout_rate=dropout_rate, bt=bt)
        h1_ref[s] = h1.astype(h1_ref.dtype)
        return carry

    jax.lax.fori_loop(0, bt, body1, 0, unroll=False)

    htile = h1_ref[...].reshape(bt * k, -1)
    proj_scr[:, :, :n_kernels * d2] = jnp.concatenate(
        [jnp.dot(htile, w2_ref[n], preferred_element_type=jnp.float32,
                 precision=prec) for n in range(n_kernels)],
        axis=-1).reshape(bt, k, n_kernels * d2)

    def body2(s, carry):
        ps = pseudo_ref[s]
        mask = mask_ref[s]
        gws2, den2 = _gaussians_one(ps[0], ps[1], gp2_ref, n_kernels)
        den2_ref[s] = den2
        proj = proj_scr[s]
        outs, ghats = [], []
        for n in range(n_kernels):
            ghat_n = gws2[n] / den2
            ghats.append(ghat_n)
            p_n = proj[:, n * d2:(n + 1) * d2]
            outs.append(jnp.dot((mask * ghat_n).astype(p_n.dtype), p_n,
                                preferred_element_type=jnp.float32,
                                precision=prec))
        ghat2_ref[s] = jnp.stack(ghats)
        out_ref[s] = jnp.maximum(
            jnp.concatenate(outs, axis=-1), 0.0).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, bt, body2, 0, unroll=False)


def _agg_bwd_one(g, sel, ghat, denom, rho, theta, gp_ref, proj_slices,
                 n_kernels, d, use_alpha, prec):
    """Per-image aggregation backward (projection handled at tile level
    by the caller). Returns (dproj_rows list, dadj, drho, dth, dgp)."""
    ind = (denom > 1e-20).astype(jnp.float32)
    dsel = jnp.zeros_like(sel)
    s_cross = jnp.zeros_like(sel)
    dgws, dprojs = [], []
    for n in range(n_kernels):
        g_n = g[:, n * d:(n + 1) * d]
        ghat_n = ghat[n]
        p_n = proj_slices[n]
        e_n = sel * ghat_n
        dprojs.append(jnp.dot(e_n.T, g_n,
                              preferred_element_type=jnp.float32,
                              precision=prec))
        g_edge = jnp.dot(g_n, p_n.T,
                         preferred_element_type=jnp.float32,
                         precision=prec)
        dsel = dsel + g_edge * ghat_n
        dgw_n = g_edge * sel
        dgws.append(dgw_n)
        s_cross = s_cross + dgw_n * ghat_n

    drho = jnp.zeros_like(sel)
    dth = jnp.zeros_like(sel)
    dmu_r, dmu_t, dpr, dpt = [], [], [], []
    two_pi = jnp.float32(_TWO_PI)
    for n in range(n_kernels):
        mu_r = gp_ref[0, n]
        mu_t = gp_ref[1, n]
        pr = gp_ref[2, n]
        pt = gp_ref[3, n]
        inv_r = 1.0 / (1e-14 + pr * pr)
        inv_t = 1.0 / (1e-14 + pt * pt)
        dw_n = (dgws[n] - ind * s_cross) / denom
        w_n = ghat[n] * denom
        dwn_wn = dw_n * w_n

        x_r = rho - mu_r
        drho = drho + dwn_wn * (-x_r * inv_r)
        dmu_r.append(jnp.sum(dwn_wn * x_r * inv_r))
        dpr.append(jnp.sum(dwn_wn * (x_r * x_r) * pr * inv_r * inv_r))

        first = jnp.abs(theta - mu_t)
        second = jnp.abs(two_pi - first)
        dist = jnp.minimum(first, second)
        dd_dfirst = jnp.where(first <= second, 1.0,
                              -jnp.sign(two_pi - first))
        sgn = jnp.sign(theta - mu_t)
        common_t = dwn_wn * (-dist * inv_t) * dd_dfirst * sgn
        dth = dth + common_t
        dmu_t.append(jnp.sum(-common_t))
        dpt.append(jnp.sum(dwn_wn * (dist * dist) * pt
                           * inv_t * inv_t))

    if use_alpha:
        row = jnp.sum(dsel * sel, axis=-1, keepdims=True)
        dadj = sel * (dsel - row)
    else:
        dadj = jnp.zeros_like(sel)
    dgp = jnp.stack([jnp.stack(dmu_r), jnp.stack(dmu_t),
                     jnp.stack(dpr), jnp.stack(dpt)])
    return dprojs, dadj, drho, dth, dgp


def _block_bwd_kernel(g_ref, out_ref, h1_ref, sel_ref, mask_ref,
                      ghat1_ref, ghat2_ref, den1_ref, den2_ref,
                      pseudo_ref, feats_ref, w1_ref, w2_ref,
                      gp1_ref, gp2_ref,
                      dadj_ref, dpseudo_ref, dfeats_ref,
                      dw1_ref, dw2_ref, dgp1_ref, dgp2_ref,
                      proj_scr, gd_scr, *,
                      n_kernels: int, d1: int, d2: int, bt: int,
                      inv_keep: float):
    prec = _dot_precision(feats_ref.dtype)
    f32 = jnp.float32
    k = sel_ref.shape[1]
    cdt = feats_ref.dtype
    nd1, nd2 = n_kernels * d1, n_kernels * d2

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    # recompute proj2 tile-level into scratch
    htile = h1_ref[...].reshape(bt * k, -1)
    proj_scr[:, :, :nd2] = jnp.concatenate(
        [jnp.dot(htile.astype(cdt), w2_ref[n],
                 preferred_element_type=f32, precision=prec)
         for n in range(n_kernels)], axis=-1).reshape(bt, k, nd2)

    # pass A: conv2 aggregation backward per image; dproj2 rows land in
    # gd_scr for the tile-level dW2 / dh1 dots afterwards
    def bodyA(s, dgp2_acc):
        ps = pseudo_ref[s]
        g2 = g_ref[s] * (out_ref[s].astype(f32) > 0).astype(f32)
        proj = proj_scr[s]
        p_slices = [proj[:, n * d2:(n + 1) * d2]
                    for n in range(n_kernels)]
        dprojs, _, drho2, dth2, dgp2 = _agg_bwd_one(
            g2, mask_ref[s], ghat2_ref[s], den2_ref[s], ps[0], ps[1],
            gp2_ref, p_slices, n_kernels, d2, False, prec)
        gd_scr[s, :, :nd2] = jnp.concatenate(dprojs, axis=-1)
        dpseudo_ref[s] = jnp.stack([drho2, dth2])
        return dgp2_acc + dgp2

    dgp2 = jax.lax.fori_loop(
        0, bt, bodyA, jnp.zeros((4, n_kernels), f32), unroll=False)
    dgp2_ref[0] = dgp2

    dp2_flat = gd_scr[...].reshape(bt * k, -1)[:, :nd2]
    dh1_flat = None
    for n in range(n_kernels):
        dp_n = dp2_flat[:, n * d2:(n + 1) * d2]
        dw2_ref[n] += jnp.dot(htile.T.astype(f32), dp_n,
                              preferred_element_type=f32,
                              precision=prec)
        dx = jnp.dot(dp_n.astype(cdt), w2_ref[n].T,
                     preferred_element_type=f32, precision=prec)
        dh1_flat = dx if dh1_flat is None else dh1_flat + dx

    # chain through conv1's relu+dropout epilogue (h1 > 0 holds both
    # masks; inv_keep restores the inverted-dropout scale), then stage
    # g1 in gd_scr — each bodyB step reads row s before rewriting it
    g1_flat = (dh1_flat * (htile.astype(f32) > 0).astype(f32)
               * f32(inv_keep))
    gd_scr[...] = g1_flat.reshape(bt, k, nd1)

    # recompute proj1 tile-level
    ftile = feats_ref[...].reshape(bt * k, -1)
    proj_scr[...] = jnp.concatenate(
        [jnp.dot(ftile, w1_ref[n], preferred_element_type=f32,
                 precision=prec) for n in range(n_kernels)],
        axis=-1).reshape(bt, k, nd1)

    def bodyB(s, dgp1_acc):
        ps = pseudo_ref[s]
        g1 = gd_scr[s]
        proj = proj_scr[s]
        p_slices = [proj[:, n * d1:(n + 1) * d1]
                    for n in range(n_kernels)]
        dprojs, dadj, drho1, dth1, dgp1 = _agg_bwd_one(
            g1, sel_ref[s], ghat1_ref[s], den1_ref[s], ps[0], ps[1],
            gp1_ref, p_slices, n_kernels, d1, True, prec)
        gd_scr[s] = jnp.concatenate(dprojs, axis=-1)
        dadj_ref[s] = dadj
        dpseudo_ref[s] = dpseudo_ref[s] + jnp.stack([drho1, dth1])
        return dgp1_acc + dgp1

    dgp1 = jax.lax.fori_loop(
        0, bt, bodyB, jnp.zeros((4, n_kernels), f32), unroll=False)
    dgp1_ref[0] = dgp1

    dp1_flat = gd_scr[...].reshape(bt * k, nd1)
    dfeats_flat = None
    for n in range(n_kernels):
        dp_n = dp1_flat[:, n * d1:(n + 1) * d1]
        dw1_ref[n] += jnp.dot(ftile.T.astype(f32), dp_n,
                              preferred_element_type=f32,
                              precision=prec)
        dx = jnp.dot(dp_n.astype(cdt), w1_ref[n].T,
                     preferred_element_type=f32, precision=prec)
        dfeats_flat = dx if dfeats_flat is None else dfeats_flat + dx
    dfeats_ref[...] = dfeats_flat.reshape(
        bt, k, -1).astype(dfeats_ref.dtype)


def _resident(shape):
    """BlockSpec for a full-array block revisited every grid step (the
    block stays VMEM-resident across the sequential TPU grid)."""
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _stream(bt, shape):
    nd = len(shape)
    return pl.BlockSpec((bt,) + shape,
                        lambda i: (i,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_graph_block(adj, pseudo, feats, w1, gp1, w2, gp2, seeds,
                      m, dropout_rate=0.0, interpret=False):
    """relu(conv2(mask, dropout(relu(conv1(alpha, feats @ W1))) @ W2)).

    adj (B,K,K) f32; pseudo (B,K,K,2); feats (B,K,F1) compute dtype;
    w1 (n,F1,d1); gp1/gp2 (4,n); w2 (n,n*d1,d2); seeds (B,) int32 or
    None (dropout_rate=0). Returns (B, K, n*d2) in feats.dtype.
    """
    out, *_ = _block_forward(adj, pseudo, feats, w1, gp1, w2, gp2,
                             seeds, m=m, dropout_rate=dropout_rate,
                             interpret=interpret)
    return out


def _block_forward(adj, pseudo, feats, w1, gp1, w2, gp2, seeds, *, m,
                   dropout_rate, interpret):
    b, k, f1 = feats.shape
    n_kernels, _, d1 = w1.shape
    d2 = w2.shape[-1]
    # proj_scr is sized (bt, K, n*d1) and REUSED for the conv2
    # projections via proj_scr[:, :, :n*d2] — valid only when d2 <= d1
    # (true for the model family: d1 = 2*hid/n, d2 = hid/n). Fail loudly
    # rather than clamp-write wrong results (ADVICE round 2).
    if d2 > d1:
        raise ValueError(
            f"fused_graph_block requires d2 <= d1 (scratch reuse); got "
            f"d1={d1}, d2={d2}")
    bt = _pick_bt(b)
    pseudo_cm = jnp.moveaxis(pseudo, -1, 1)
    cdt = feats.dtype

    in_specs = [
        _stream(bt, (k, k)),            # adj
        _stream(bt, (2, k, k)),         # pseudo
        _stream(bt, (k, f1)),           # feats
        _resident((n_kernels, f1, d1)),         # w1 (VMEM-resident)
        _resident((n_kernels, n_kernels * d1, d2)),  # w2
        pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [adj.astype(jnp.float32), pseudo_cm.astype(jnp.float32),
            feats, w1.astype(cdt), w2.astype(cdt),
            gp1.astype(jnp.float32), gp2.astype(jnp.float32)]
    if dropout_rate > 0:
        assert seeds is not None
        in_specs.append(pl.BlockSpec((b,), lambda i: (0,),
                                     memory_space=pltpu.SMEM))
        args.append(seeds.astype(jnp.int32))

    kern = functools.partial(
        _block_fwd_kernel, m=m, n_kernels=n_kernels, d1=d1, d2=d2,
        bt=bt, dropout_rate=dropout_rate)
    outs = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=[
            _stream(bt, (k, n_kernels * d2)),   # out2
            _stream(bt, (k, n_kernels * d1)),   # h1
            _stream(bt, (k, k)),                # sel (alpha)
            _stream(bt, (k, k)),                # mask
            _stream(bt, (n_kernels, k, k)),     # ghat1
            _stream(bt, (n_kernels, k, k)),     # ghat2
            _stream(bt, (k, k)),                # denom1
            _stream(bt, (k, k)),                # denom2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, n_kernels * d2), cdt),
            jax.ShapeDtypeStruct((b, k, n_kernels * d1), cdt),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n_kernels, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, n_kernels, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, k, n_kernels * d1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(*args)
    return outs


def _fwd(adj, pseudo, feats, w1, gp1, w2, gp2, seeds, m, dropout_rate,
         interpret):
    out, h1, sel, mask, ghat1, ghat2, den1, den2 = _block_forward(
        adj, pseudo, feats, w1, gp1, w2, gp2, seeds, m=m,
        dropout_rate=dropout_rate, interpret=interpret)
    pseudo_cm = jnp.moveaxis(pseudo, -1, 1)
    return out, (out, h1, sel, mask, ghat1, ghat2, den1, den2,
                 pseudo_cm, feats, w1, w2, gp1, gp2)


def _bwd(m, dropout_rate, interpret, res, g):
    (out, h1, sel, mask, ghat1, ghat2, den1, den2, pseudo_cm, feats,
     w1, w2, gp1, gp2) = res
    b, k, f1 = feats.shape
    n_kernels, _, d1 = w1.shape
    d2 = w2.shape[-1]
    bt = _pick_bt(b)
    cdt = feats.dtype
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0 else 1.0

    kern = functools.partial(
        _block_bwd_kernel, n_kernels=n_kernels, d1=d1, d2=d2, bt=bt,
        inv_keep=inv_keep)
    dadj, dpseudo_cm, dfeats, dw1, dw2, dgp1_p, dgp2_p = pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            _stream(bt, (k, n_kernels * d2)),   # g
            _stream(bt, (k, n_kernels * d2)),   # out
            _stream(bt, (k, n_kernels * d1)),   # h1
            _stream(bt, (k, k)),                # sel
            _stream(bt, (k, k)),                # mask
            _stream(bt, (n_kernels, k, k)),     # ghat1
            _stream(bt, (n_kernels, k, k)),     # ghat2
            _stream(bt, (k, k)),                # den1
            _stream(bt, (k, k)),                # den2
            _stream(bt, (2, k, k)),             # pseudo
            _stream(bt, (k, f1)),               # feats
            _resident((n_kernels, f1, d1)),     # w1
            _resident((n_kernels, n_kernels * d1, d2)),  # w2
            pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, n_kernels), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            _stream(bt, (k, k)),                # dadj
            _stream(bt, (2, k, k)),             # dpseudo
            _stream(bt, (k, f1)),               # dfeats
            _resident((n_kernels, f1, d1)),     # dw1 (accumulated)
            _resident((n_kernels, n_kernels * d1, d2)),  # dw2
            pl.BlockSpec((1, 4, n_kernels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_kernels), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, k, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k, f1), cdt),
            jax.ShapeDtypeStruct((n_kernels, f1, d1), jnp.float32),
            jax.ShapeDtypeStruct((n_kernels, n_kernels * d1, d2),
                                 jnp.float32),
            jax.ShapeDtypeStruct((b // bt, 4, n_kernels), jnp.float32),
            jax.ShapeDtypeStruct((b // bt, 4, n_kernels), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, k, n_kernels * d1), jnp.float32),
            pltpu.VMEM((bt, k, n_kernels * d1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(g.astype(jnp.float32), out, h1, sel, mask, ghat1, ghat2,
      den1, den2, pseudo_cm, feats, w1.astype(cdt), w2.astype(cdt),
      gp1.astype(jnp.float32), gp2.astype(jnp.float32))

    dpseudo = jnp.moveaxis(dpseudo_cm, 1, -1)
    dgp1 = jnp.sum(dgp1_p, axis=0)
    dgp2 = jnp.sum(dgp2_p, axis=0)
    dseeds = None
    return (dadj, dpseudo, dfeats, dw1.astype(w1.dtype), dgp1,
            dw2.astype(w2.dtype), dgp2, dseeds)


fused_graph_block.defvjp(_fwd, _bwd)


def fused_graph_block_reference(adj, pseudo, feats, w1, gp1, w2, gp2,
                                *, m, keep_mask=None, dropout_rate=0.0,
                                compute_dtype=jnp.float32):
    """XLA oracle: chain of the two reference aggregations with the
    projections and activation tail, optionally applying a FIXED
    dropout keep_mask (for verifying the kernel's gradients with the
    realized mask frozen)."""
    from vqa_project_tpu.ops.neighbourhood import masked_neighbourhood

    cdt = jnp.dtype(compute_dtype)
    n_kernels = w1.shape[0]
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    proj1 = jnp.einsum("bkf,nfd->bknd", feats.astype(cdt),
                       w1.astype(cdt), precision=prec,
                       preferred_element_type=jnp.float32)
    b, k = feats.shape[:2]
    h1 = edge_aggregate_reference(
        adj, pseudo, proj1.reshape(b, k, -1), gp1, m=m, use_alpha=True)
    h1 = jax.nn.relu(h1)
    if keep_mask is not None:
        h1 = h1 * keep_mask / (1.0 - dropout_rate)
    proj2 = jnp.einsum("bkf,nfd->bknd", h1.astype(cdt),
                       w2.astype(cdt), precision=prec,
                       preferred_element_type=jnp.float32)
    out = edge_aggregate_reference(
        adj, pseudo, proj2.reshape(b, k, -1), gp2, m=m, use_alpha=False)
    return jax.nn.relu(out)
