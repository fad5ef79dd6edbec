"""Masked GRU question encoder as a jax.lax.scan.

Parity target: the packed-sequence GRU of the reference
(/root/reference/sparse_graph_model.py:69,117-121). PyTorch's
pack_padded_sequence + nn.GRU returns the hidden state at step qlen-1 of
each sequence; on TPU we run a fixed-length scan and freeze the hidden
state once t >= qlen — identical result, static shapes, no host sync.

Gate math matches torch.nn.GRU exactly (gate order [r; z; n], separate
input/hidden biases, reset gate applied to the hidden candidate's
pre-activation):
    r = sigmoid(x Wir^T + bir + h Whr^T + bhr)
    z = sigmoid(x Wiz^T + biz + h Whz^T + bhz)
    n = tanh(x Win^T + bin + r * (h Whn^T + bhn))
    h' = (1 - z) * n + z * h

The input projection for all timesteps is hoisted out of the scan into one
(B*T, E) x (E, 3H) matmul so the sequential part is only the (B, H) x
(H, 3H) recurrence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_encode(
    emb: jnp.ndarray,
    qlen: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    *,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Run the GRU and return each sequence's hidden state at qlen-1.

    Args:
      emb:  (B, T, E) embedded question tokens (fixed T).
      qlen: (B,) int32 true lengths, 1 <= qlen <= T.
      w_ih: (3H, E) input weights, torch layout [r; z; n].
      w_hh: (3H, H) hidden weights.
      b_ih, b_hh: (3H,) biases.
    Returns:
      (B, H) float32 final hidden states.
    """
    b, t, _ = emb.shape
    h3 = w_ih.shape[0]
    h = h3 // 3

    from vqa_project_tpu.ops.graph_conv import matmul_precision

    prec = matmul_precision(compute_dtype)
    x = emb.astype(compute_dtype)
    # Hoisted input projection: (B, T, 3H).
    xp = (
        jnp.einsum("bte,ge->btg", x, w_ih.astype(compute_dtype),
                   preferred_element_type=jnp.float32, precision=prec)
        + b_ih.astype(jnp.float32)
    )
    xp = jnp.swapaxes(xp, 0, 1)                      # (T, B, 3H) scan-major

    w_hh_t = jnp.swapaxes(w_hh.astype(compute_dtype), 0, 1)  # (H, 3H)
    b_hh32 = b_hh.astype(jnp.float32)
    qlen = qlen.astype(jnp.int32)

    def step(h_prev, inputs):
        xp_t, t_idx = inputs
        hp = (
            jnp.dot(h_prev.astype(compute_dtype), w_hh_t,
                    preferred_element_type=jnp.float32, precision=prec)
            + b_hh32
        )                                             # (B, 3H)
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h_prev
        # Freeze once past each sequence's true length.
        keep = (t_idx < qlen)[:, None]
        h_out = jnp.where(keep, h_new, h_prev)
        return h_out, None

    h0 = jnp.zeros((b, h), dtype=jnp.float32)
    t_ids = jnp.arange(t, dtype=jnp.int32)
    h_final, _ = jax.lax.scan(step, h0, (xp, t_ids))
    return h_final
