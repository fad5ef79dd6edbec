"""Narrow-bits inverted dropout.

flax's nn.Dropout draws a u32 word per element (via random.bernoulli ->
uniform f32 compare). For the model's (B, K, 2052) feature dropout
(sparse_graph_model.py:111 semantics) that u32 tensor is 75.6 MB of HBM
traffic per step at bs 256 — measured 117 us in the select fusion, on
a step whose total busy time is ~6.6 ms. Drawing u8/u16 bits instead
cuts that term 4x/2x.

Cost of the narrowing: the keep probability quantizes to 1/2^width
(u8: |err| <= 2^-9 absolute — e.g. rate 0.4 keeps with p = 154/256
= 0.6016 instead of 0.6). The inverted 1/(1-rate) scale still uses the
EXACT configured rate, so kept activations are bit-identical to flax's;
only the mask frequency carries the quantization. The model reads
VQAX_DROPOUT_BITS=8|16|32 with DEFAULT 8 (graph_vqa.py — the u8 draw is
the shipped path, A/B'd on-chip); set 32 explicitly for the stock flax
u32 Bernoulli draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def narrow_bits_dropout(x: jnp.ndarray, rate: float, rng,
                        width: int = 8) -> jnp.ndarray:
    """Inverted dropout with a u8/u16 Bernoulli draw.

    Keeps each element iff bits >= round(rate * 2^width) (P(keep) =
    1 - t/2^width); kept elements are scaled by 1/(1-rate) in x's dtype.
    """
    assert width in (8, 16), width
    bdt = jnp.uint8 if width == 8 else jnp.uint16
    span = 2 ** width
    thresh = min(int(round(rate * span)), span - 1)
    bits = jax.random.bits(rng, x.shape, bdt)
    out = jnp.where(bits >= jnp.asarray(thresh, bdt),
                    x * jnp.asarray(1.0 / (1.0 - rate), x.dtype),
                    jnp.zeros((), x.dtype))
    # barrier: without it XLA operand-fuses the narrow mask into every
    # downstream GEMM read — measured +366 us/step (the dot re-applies
    # the dropout math per tile read). Materializing once keeps the
    # narrow-bits win a pure bits-traffic saving, matching how the u32
    # flax path fuses (one standalone select fusion).
    return jax.lax.optimization_barrier(out)
