"""Model-level tests: shapes, jit, determinism, gradients, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqa_project_tpu.config import ModelConfig
from vqa_project_tpu.models import GraphVQAModel
from vqa_project_tpu.ops import multilabel_soft_margin_loss

CFG = ModelConfig(
    vocab_size=50, emb_dim=16, feat_dim=36, hid_dim=32, out_dim=24,
    combined_dim=20, n_kernels=4, neighbourhood_size=5, n_obj=10,
    dropout=0.3, max_qlen=8, compute_dtype="float32",
)


def make_batch(rng, b=4):
    q = rng.integers(1, CFG.vocab_size, size=(b, CFG.max_qlen)).astype(np.int32)
    qlen = rng.integers(1, CFG.max_qlen + 1, size=(b,)).astype(np.int32)
    feats = rng.normal(size=(b, CFG.n_obj, CFG.feat_dim - 4)).astype(np.float32)
    # xyxy boxes in [0,1] with x2>x1, y2>y1
    xy1 = rng.uniform(0, 0.5, size=(b, CFG.n_obj, 2))
    wh = rng.uniform(0.05, 0.5, size=(b, CFG.n_obj, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
    image = np.concatenate([feats, boxes], axis=-1)
    return (jnp.asarray(q), jnp.asarray(image), jnp.asarray(qlen))


@pytest.fixture(scope="module")
def model_and_params():
    model = GraphVQAModel(cfg=CFG)
    rng = np.random.default_rng(0)
    q, image, qlen = make_batch(rng)
    params = model.init(jax.random.key(0), q, image, qlen)
    return model, params


def test_forward_shapes(model_and_params, rng):
    model, params = model_and_params
    q, image, qlen = make_batch(rng)
    logits, adj, h_max_idx = model.apply(params, q, image, qlen)
    assert logits.shape == (4, CFG.out_dim)
    assert adj.shape == (4, CFG.n_obj, CFG.n_obj)
    assert h_max_idx.shape == (4, CFG.hid_dim)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(adj)).all()


def test_forward_jit_deterministic(model_and_params, rng):
    model, params = model_and_params
    batch = make_batch(rng)
    f = jax.jit(lambda p, q, i, l: model.apply(p, q, i, l)[0])
    a = np.asarray(f(params, *batch))
    b = np.asarray(f(params, *batch))
    np.testing.assert_array_equal(a, b)


def test_adjacency_symmetric(model_and_params, rng):
    """A = E E^T is symmetric by construction."""
    model, params = model_and_params
    q, image, qlen = make_batch(rng)
    _, adj, _ = model.apply(params, q, image, qlen)
    adj = np.asarray(adj)
    np.testing.assert_allclose(adj, np.swapaxes(adj, 1, 2), atol=1e-4)


def test_dropout_train_vs_eval(model_and_params, rng):
    model, params = model_and_params
    batch = make_batch(rng)
    eval_logits = model.apply(params, *batch, train=False)[0]
    train_logits = model.apply(
        params, *batch, train=True,
        rngs={"dropout": jax.random.key(7)})[0]
    assert not np.allclose(np.asarray(eval_logits), np.asarray(train_logits))
    # eval is deterministic without rngs
    again = model.apply(params, *batch, train=False)[0]
    np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(again))


@pytest.mark.parametrize("width,rate", [(8, 0.5), (8, 0.4), (16, 0.3)])
def test_narrow_bits_dropout(rng, width, rate):
    """u8/u16 dropout: kept units carry the exact 1/(1-rate) inverted
    scale, dropped units are exactly zero, and the empirical keep rate
    sits within a 5-sigma binomial CI of the quantized probability."""
    from vqa_project_tpu.ops.dropout import narrow_bits_dropout

    x = jnp.asarray(rng.normal(size=(64, 36, 128)).astype(np.float32))
    out = np.asarray(narrow_bits_dropout(x, rate, jax.random.key(3),
                                         width=width))
    xs = np.asarray(x)
    kept = out != 0
    np.testing.assert_allclose(out[kept], xs[kept] / (1.0 - rate),
                               rtol=1e-6)
    span = 2 ** width
    p_keep = 1.0 - round(rate * span) / span
    n = out.size
    sigma = np.sqrt(p_keep * (1 - p_keep) / n)
    assert abs(kept.mean() - p_keep) < 5 * sigma, (kept.mean(), p_keep)


def test_narrow_bits_dropout_in_model(model_and_params, rng, monkeypatch):
    """VQAX_DROPOUT_BITS=8 routes the model's feature dropout through
    the narrow-bits path: train-mode output differs from eval and stays
    finite; eval mode is untouched by the knob."""
    monkeypatch.setenv("VQAX_DROPOUT_BITS", "8")
    model, params = model_and_params
    batch = make_batch(rng)
    eval_logits = model.apply(params, *batch, train=False)[0]
    train_logits = model.apply(
        params, *batch, train=True,
        rngs={"dropout": jax.random.key(7)})[0]
    assert np.isfinite(np.asarray(train_logits)).all()
    assert not np.allclose(np.asarray(eval_logits),
                           np.asarray(train_logits))


def test_gradients_flow_to_all_params(model_and_params, rng):
    model, params = model_and_params
    q, image, qlen = make_batch(rng)
    targets = jnp.asarray(
        rng.uniform(size=(4, CFG.out_dim)).astype(np.float32))

    def loss_fn(p):
        logits, _, _ = model.apply(p, q, image, qlen)
        return multilabel_soft_margin_loss(logits, targets)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero_grads = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if not np.any(np.asarray(g))
    ]
    assert zero_grads == [], f"params with all-zero grads: {zero_grads}"


def test_overfit_one_batch(rng):
    """End-to-end training sanity: loss decreases sharply on one batch."""
    model = GraphVQAModel(cfg=CFG)
    q, image, qlen = make_batch(rng, b=8)
    params = model.init(jax.random.key(0), q, image, qlen)
    # one-hot targets
    labels = rng.integers(0, CFG.out_dim, size=(8,))
    targets = jnp.asarray(np.eye(CFG.out_dim, dtype=np.float32)[labels])

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            logits, _, _ = model.apply(p, q, image, qlen)
            return multilabel_soft_margin_loss(logits, targets)
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    first = None
    for i in range(100):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.05 * first, (first, float(loss))


def test_split_shared_matches_concat_formulation(model_and_params, rng,
                                                 monkeypatch):
    """The split-dot GraphLearner path (default) and the reference's
    concat formulation (VQAX_SPLIT_SHARED=0) produce the same logits and
    adjacency from the SAME parameters."""
    model, params = model_and_params
    batch = make_batch(rng)
    logits_a, adj_a, _ = model.apply(params, *batch)
    monkeypatch.setenv("VQAX_SPLIT_SHARED", "0")
    logits_b, adj_b, _ = model.apply(params, *batch)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adj_a), np.asarray(adj_b),
                               rtol=1e-5, atol=1e-5)


def test_int8_matmul_accuracy(rng):
    """ops/quant.py int8_matmul: per-column weight + per-tensor dynamic
    activation quantization stays within ~2% relative error of the f32
    product on gaussian data."""
    from vqa_project_tpu.ops.quant import int8_matmul, quantize_weight

    x = rng.normal(size=(128, 96)).astype(np.float32)
    w = (rng.normal(size=(96, 64)) * rng.uniform(0.1, 3.0, (1, 64))
         ).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_matmul(jnp.asarray(x), q, s))
    want = x @ w
    rms_rel = (np.sqrt(((got - want) ** 2).mean())
               / np.sqrt((want ** 2).mean()))
    assert rms_rel < 0.02, rms_rel
    denom = np.maximum(np.abs(want), np.abs(want).mean())
    assert np.max(np.abs(got - want) / denom) < 0.15


def test_quantized_inference_matches_f32(model_and_params, rng):
    """cfg.quantized_inference + quantize_params_for_serving: the int8
    serving forward agrees with the f32 forward on nearly all argmax
    predictions and keeps logits close."""
    import dataclasses

    from vqa_project_tpu.models import GraphVQAModel
    from vqa_project_tpu.ops.quant import quantize_params_for_serving

    model, params = model_and_params
    batch = make_batch(rng)
    ref_logits = np.asarray(model.apply(params, *batch, train=False)[0])

    qcfg = dataclasses.replace(model.cfg, quantized_inference=True)
    qmodel = GraphVQAModel(cfg=qcfg)
    qparams = quantize_params_for_serving(params)
    q_logits = np.asarray(qmodel.apply(qparams, *batch, train=False)[0])

    agree = (ref_logits.argmax(-1) == q_logits.argmax(-1)).mean()
    assert agree >= 0.9, agree
    # logit error bounded relative to the logit scale
    scale = np.abs(ref_logits).max()
    assert np.abs(q_logits - ref_logits).max() / scale < 0.15


def test_quantized_inference_rejects_train(model_and_params, rng):
    import dataclasses

    from vqa_project_tpu.models import GraphVQAModel
    from vqa_project_tpu.ops.quant import quantize_params_for_serving

    model, params = model_and_params
    qcfg = dataclasses.replace(model.cfg, quantized_inference=True)
    qmodel = GraphVQAModel(cfg=qcfg)
    qparams = quantize_params_for_serving(params)
    with pytest.raises(AssertionError):
        qmodel.apply(qparams, *make_batch(rng), train=True,
                     rngs={"dropout": jax.random.key(0)})
