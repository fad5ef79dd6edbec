"""FULL-WIDTH torch-oracle parity: the capstone e2e comparison at the
reference's PRODUCTION dimensions.

Round-4 verdict: every numerical oracle ran at toy width (hid 32,
4 kernels, 24 answers); production width was only proven by convergence,
which cannot catch a 1e-2-level numerics drift. This file runs the same
independent torch functional oracle as tests/test_e2e_torch_parity.py at
the real shape — hid 1024, 8 kernels, K=36, m=16, 13k question vocab,
3001 answers, f32 compute (/root/reference/sparse_graph_model.py:28-269
with run.py:503-531 defaults) — for the XLA path, the fused-Pallas path
(interpret mode), and a bf16-compute argmax-agreement stat for the
shipped mixed-precision default.

Tolerances scale with width: adjacency entries are 512-term dot products
over ~3076-dim embeddings, so elementwise agreement is asserted relative
to the tensor's own magnitude (same normalization the on-chip kernel
oracles use).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_e2e_torch_parity import torch_oracle_forward
from tests.test_torch_import import _make_torch_state_dict
from vqa_project_tpu.config import ModelConfig
from vqa_project_tpu.models import GraphVQAModel
from vqa_project_tpu.models.torch_import import import_torch_state_dict

# Production dims: run.py:503-531 (hid 1024, 8 kernels, neigh 16, K=36,
# 3001 answers, GloVe 300) with a realistic 13k question vocab
# (preprocess_text builds ~13k words from VQA v2 train).
FULL_CFG = ModelConfig(
    vocab_size=13000, emb_dim=300, feat_dim=2052, hid_dim=1024,
    out_dim=3001, combined_dim=512, n_kernels=8, neighbourhood_size=16,
    n_obj=36, dropout=0.5, max_qlen=16, compute_dtype="float32",
    use_pallas=False,
)


def _make_batch(rng, b):
    cfg = FULL_CFG
    q = rng.integers(1, cfg.vocab_size, size=(b, cfg.max_qlen)
                     ).astype(np.int32)
    qlen = rng.integers(3, 15, size=(b,)).astype(np.int32)  # real 3-14
    feats = rng.normal(size=(b, cfg.n_obj, cfg.feat_dim - 4)
                       ).astype(np.float32)
    xy1 = rng.uniform(0, 0.5, size=(b, cfg.n_obj, 2))
    wh = rng.uniform(0.05, 0.5, size=(b, cfg.n_obj, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
    image = np.concatenate([feats, boxes], axis=-1)
    return (jnp.asarray(q), jnp.asarray(image), jnp.asarray(qlen))


@pytest.fixture(scope="module")
def full_width():
    """State dict + imported params + oracle outputs, computed once and
    shared by the XLA / Pallas / bf16 tests (the oracle forward at width
    is the expensive part)."""
    sd = _make_torch_state_dict(FULL_CFG)
    params = import_torch_state_dict(sd)
    rng = np.random.default_rng(20260819)
    q, image, qlen = _make_batch(rng, b=4)
    logits_t, adj_t = torch_oracle_forward(
        sd, q, image, qlen, FULL_CFG.neighbourhood_size)
    return params, (q, image, qlen), logits_t, adj_t


def _rel_close(got, want, tol):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(np.abs(want).max(), 1e-12)
    np.testing.assert_allclose(got / scale, want / scale, atol=tol)


def test_fullwidth_xla_matches_torch_oracle(full_width):
    params, batch, logits_t, adj_t = full_width
    model = GraphVQAModel(cfg=FULL_CFG)
    logits_j, adj_j, _ = model.apply(params, *batch)
    _rel_close(adj_j, adj_t, 2e-5)
    _rel_close(logits_j, logits_t, 2e-5)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits_j, -1)), logits_t.argmax(-1))


def test_fullwidth_pallas_matches_torch_oracle(full_width):
    """Fused-Pallas path (interpret mode on CPU) at production width."""
    params, batch, logits_t, adj_t = full_width
    model = GraphVQAModel(
        cfg=dataclasses.replace(FULL_CFG, use_pallas=True))
    logits_j, adj_j, _ = model.apply(params, *batch)
    _rel_close(adj_j, adj_t, 2e-5)
    _rel_close(logits_j, logits_t, 2e-5)
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(logits_j, -1)), logits_t.argmax(-1))


def test_fullwidth_bf16_argmax_agreement(full_width):
    """The shipped default computes matmuls in bf16: quantify (not just
    assume) how often that flips the top-1 answer vs the f32 oracle at
    production width. Random ~0.05-scale weights give near-degenerate
    logits over 3001 classes — the hardest case for argmax stability —
    so the assertion is a floor, and the measured agreement is printed
    for PARITY.md."""
    params, batch, logits_t, _ = full_width
    model = GraphVQAModel(
        cfg=dataclasses.replace(FULL_CFG, compute_dtype="bfloat16"))
    logits_b, _, _ = model.apply(params, *batch)
    logits_b = np.asarray(logits_b, dtype=np.float32)
    agree = float(np.mean(logits_b.argmax(-1) == logits_t.argmax(-1)))
    print(f"\nbf16 vs f32-oracle argmax agreement: {agree:.2f} "
          f"(b={logits_b.shape[0]})")
    # bf16 logits stay within ~5% of the f32 oracle (measured 2.1e-2
    # max normalized deviation at this width; bf16 mantissa is 8 bits)
    _rel_close(logits_b, logits_t, 5e-2)
    assert agree >= 0.5
