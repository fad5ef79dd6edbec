"""int8 weight quantization for serving (opt-in, inference-only).

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (probed
on-chip: an identical (9216,2048)x(2048,2048) GEMM sequence measured
4178 us busy in int8 vs 8016 us in bf16). The eval forward is dominated
by the two graph-conv projection GEMMs (~690 of ~1984 us busy at bs
256), so quantizing JUST those weights buys a large serving win with a
tightly bounded numerics change:

- weights: symmetric per-output-column int8 (scale = max|W[:,c]|/127) —
  quantized ONCE at load by quantize_params_for_serving().
- activations: symmetric per-tensor dynamic int8 (scale computed per
  batch from max|x|). The product rescale folds both scales into one
  f32 multiply per output element.

The reference has no quantization story (fp32 everywhere); this is a
TPU-serving surplus. The Gaussian-kernel weights, edge layers, GRU and
classifier stay in the bf16/f32 policy — epsilon-sensitive math is
untouched (SURVEY.md "Hard parts": 1e-14 epsilons).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """Per-output-column symmetric int8: returns (q (in,out) int8,
    scale (out,) f32) with W ~= q * scale."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                w_scale: jnp.ndarray) -> jnp.ndarray:
    """(M, in) float x int8-quantized (in, out) -> (M, out) float32.

    Dynamic per-tensor activation quantization; int32 MXU accumulate;
    one fused dequant multiply."""
    x = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * w_scale)[None, :]


def quantize_params_for_serving(params):
    """Transform a trained param tree for a quantized_inference model:

    - each graph_convolution_*'s f32 conv_kernels leaf becomes
      (conv_kernels_q int8, conv_kernels_scale f32);
    - each weight-norm dense ({g, v[, b]}: the edge layers and the
      classifier) becomes (v_q int8, v_scale f32, b) with the
      weight-norm column scale g/||v|| FOLDED into v_scale — the
      effective W = v * g/||v|| is what gets quantized, exactly.

    The result is what GraphVQAModel(cfg with quantized_inference=True)
    .apply expects."""
    from collections.abc import Mapping

    import numpy as np

    def _is_weight_norm(leaf):
        return (isinstance(leaf, Mapping) and "g" in leaf and "v" in leaf)

    def _copy(d):
        if isinstance(d, Mapping):
            return {k: _copy(v) for k, v in d.items()}
        return d

    tree = _copy(params)
    p = tree["params"] if "params" in tree else tree
    converted = 0

    def _walk(node):
        nonlocal converted
        for name, leaf in list(node.items()):
            if not isinstance(leaf, Mapping):
                continue
            if "conv_kernels" in leaf:
                q, s = quantize_weight(leaf.pop("conv_kernels"))
                leaf["conv_kernels_q"] = q
                leaf["conv_kernels_scale"] = s
                converted += 1
            elif _is_weight_norm(leaf):
                v = np.asarray(leaf.pop("v"), np.float32)
                g = np.asarray(leaf.pop("g"), np.float32)
                wn = g / np.maximum(np.linalg.norm(v, axis=0), 1e-12)
                q, s = quantize_weight(jnp.asarray(v))
                leaf["v_q"] = q
                leaf["v_scale"] = jnp.asarray(np.asarray(s) * wn,
                                              jnp.float32)
                converted += 1
            else:
                _walk(leaf)
    _walk(p)
    assert converted >= 3, f"only {converted} quantizable layers found"
    return tree


def quantize_feature_table(feats):
    """Per-box-row symmetric int8 for the device FEATURE cache.

    (N, K, F) -> (q int8 (N, K, F), scale f32 (N, K)) with
    feats ~= q * scale[..., None]; max abs error scale/2 per element
    (~0.4% of the row's absmax). Host-side numpy on purpose: it runs
    once at cache-build time over a potentially multi-GB table, with no
    device round trip. All-zero rows (padding boxes in variable-n_obj
    medical tables) get scale 1 so they quantize to exact zeros.

    The row granularity matches the model's consumption: each box row
    feeds the same projection, and RCNN activations are non-negative
    with per-box dynamic range, so per-box absmax wastes no codes on
    cross-box range mismatch.
    """
    import numpy as np

    feats = np.asarray(feats, np.float32)
    scale = np.abs(feats).max(axis=2) / 127.0
    scale = np.where(scale > 0, scale, 1.0).astype(np.float32)
    q = np.clip(np.rint(feats / scale[..., None]), -127,
                127).astype(np.int8)
    return q, scale
