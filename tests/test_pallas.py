"""Pallas fused graph-block kernel vs the XLA reference (interpret mode
on CPU; the same kernel compiles for real TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_project_tpu.ops.pallas import (
    edge_aggregate_reference,
    fused_edge_aggregate,
)

B, K, M, N_KERN, D = 2, 12, 5, 4, 8


def _inputs(rng):
    adj = rng.normal(size=(B, K, K)).astype(np.float32)
    pseudo = np.stack(
        [rng.uniform(0, 1.5, size=(B, K, K)),
         rng.uniform(-np.pi, np.pi, size=(B, K, K))], axis=-1
    ).astype(np.float32)
    proj = rng.normal(size=(B, K, N_KERN * D)).astype(np.float32)
    gparams = np.stack([
        rng.uniform(0, 1, N_KERN),
        rng.uniform(-np.pi, np.pi, N_KERN),
        rng.uniform(0.1, 1, N_KERN),
        rng.uniform(0.1, 1, N_KERN),
    ]).astype(np.float32)
    return map(jnp.asarray, (adj, pseudo, proj, gparams))


@pytest.mark.parametrize("use_alpha", [True, False])
def test_kernel_matches_reference(rng, use_alpha):
    adj, pseudo, proj, gparams = _inputs(rng)
    got = np.asarray(fused_edge_aggregate(
        adj, pseudo, proj, gparams, M, use_alpha, True))
    want = np.asarray(edge_aggregate_reference(
        adj, pseudo, proj, gparams, m=M, use_alpha=use_alpha))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_reference_grads(rng):
    adj, pseudo, proj, gparams = _inputs(rng)

    def loss_fused(a, p, pr, gp):
        return jnp.sum(fused_edge_aggregate(a, p, pr, gp, M, True, True)
                       ** 2)

    def loss_ref(a, p, pr, gp):
        return jnp.sum(edge_aggregate_reference(
            a, p, pr, gp, m=M, use_alpha=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 2, 3))(
        adj, pseudo, proj, gparams)
    g_ref = jax.grad(loss_ref, argnums=(0, 2, 3))(
        adj, pseudo, proj, gparams)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=1e-4)


def test_kbf_boundary_matches_reference(rng, monkeypatch):
    """VQAX_KBF=1 transposes the proj/cotangent operands at the Pallas
    boundary to (K, B, nd) — a bitcast of the layout XLA's projection
    GEMMs already emit — and un-transposes in VMEM. Forward and all
    gradients must match the XLA reference exactly as the default
    boundary does."""
    monkeypatch.setenv("VQAX_KBF", "1")
    adj, pseudo, proj, gparams = _inputs(rng)
    got = np.asarray(fused_edge_aggregate(
        adj, pseudo, proj, gparams, M, True, True))
    want = np.asarray(edge_aggregate_reference(
        adj, pseudo, proj, gparams, m=M, use_alpha=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_fused(a, p, pr, gp):
        return jnp.sum(fused_edge_aggregate(a, p, pr, gp, M, True, True)
                       ** 2)

    def loss_ref(a, p, pr, gp):
        return jnp.sum(edge_aggregate_reference(
            a, p, pr, gp, m=M, use_alpha=True) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        adj, pseudo, proj, gparams)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
        adj, pseudo, proj, gparams)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=1e-4)


def test_model_pallas_matches_xla(rng):
    """Full model forward with use_pallas=True (interpret) equals the
    XLA path bit-for-bit in semantics (small tolerance for fp order)."""
    import dataclasses

    from tests.test_model import CFG, make_batch
    from vqa_project_tpu.models import GraphVQAModel

    q, image, qlen = make_batch(rng)
    xla_model = GraphVQAModel(cfg=CFG)
    params = xla_model.init(jax.random.key(0), q, image, qlen)
    pallas_model = GraphVQAModel(
        cfg=dataclasses.replace(CFG, use_pallas=True))

    logits_x, adj_x, _ = xla_model.apply(params, q, image, qlen)
    logits_p, adj_p, _ = pallas_model.apply(params, q, image, qlen)
    np.testing.assert_allclose(np.asarray(adj_x), np.asarray(adj_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_x), np.asarray(logits_p),
                               rtol=2e-4, atol=2e-5)


def test_pallas_gru_matches_xla(rng):
    from vqa_project_tpu.ops import gru_encode
    from vqa_project_tpu.ops.pallas import gru_encode_pallas

    b, t, e, h = 4, 9, 12, 16
    emb = rng.normal(size=(b, t, e)).astype(np.float32)
    qlen = np.array([9, 1, 5, 7], dtype=np.int32)
    params = [
        (rng.normal(size=s) * 0.2).astype(np.float32)
        for s in [(3 * h, e), (3 * h, h), (3 * h,), (3 * h,)]
    ]
    want = np.asarray(gru_encode(
        jnp.asarray(emb), jnp.asarray(qlen), *map(jnp.asarray, params),
        compute_dtype=jnp.float32))
    got = np.asarray(gru_encode_pallas(
        jnp.asarray(emb), jnp.asarray(qlen), *map(jnp.asarray, params),
        compute_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_gru_gradients_match(rng):
    from vqa_project_tpu.ops import gru_encode
    from vqa_project_tpu.ops.pallas import gru_encode_pallas

    b, t, e, h = 3, 6, 8, 12
    emb = rng.normal(size=(b, t, e)).astype(np.float32)
    qlen = np.array([6, 2, 4], dtype=np.int32)
    params = [
        (rng.normal(size=s) * 0.2).astype(np.float32)
        for s in [(3 * h, e), (3 * h, h), (3 * h,), (3 * h,)]
    ]
    jp = list(map(jnp.asarray, params))

    def loss_x(emb_, w_ih, w_hh, b_ih, b_hh):
        out = gru_encode(emb_, jnp.asarray(qlen), w_ih, w_hh, b_ih, b_hh,
                         compute_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    def loss_p(emb_, w_ih, w_hh, b_ih, b_hh):
        out = gru_encode_pallas(emb_, jnp.asarray(qlen), w_ih, w_hh,
                                b_ih, b_hh, compute_dtype=jnp.float32,
                                interpret=True)
        return jnp.sum(out ** 2)

    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3, 4))(jnp.asarray(emb), *jp)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(jnp.asarray(emb), *jp)
    for a, b_ in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_gru_bwd_kernel_matches_xla_reference(rng):
    """The reverse-time Pallas backward equals the XLA reverse-scan
    backward for all gradients."""
    from vqa_project_tpu.ops.pallas.gru_scan import (
        _bwd,
        _bwd_xla_reference,
        _pallas_forward,
    )

    t, bsz, e, h = 7, 4, 8, 12
    h3 = 3 * h
    xp = jnp.asarray(rng.normal(size=(t, bsz, h3)).astype(np.float32))
    w_t = jnp.asarray((rng.normal(size=(h, h3)) * 0.2).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(h3,)) * 0.2).astype(np.float32))
    qlen = jnp.asarray(np.array([7, 2, 5, 1], np.int32))
    _, hs = _pallas_forward(xp, w_t, b, qlen, True)
    gh = jnp.asarray(rng.normal(size=(bsz, h)).astype(np.float32))

    res = (xp, w_t, b, qlen, hs)
    got = _bwd(True, res, gh)
    want = _bwd_xla_reference(res, gh)
    for g, w in zip(got[:3], want[:3]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-6)


def test_pallas_gru_bwd_kernel_via_env(rng, monkeypatch):
    """custom_vjp with VQAX_PALLAS_GRU_BWD=1 routes through the Pallas
    backward and still matches the XLA gradients."""
    monkeypatch.setenv("VQAX_PALLAS_GRU_BWD", "1")
    test_pallas_gru_gradients_match(rng)


def test_gru_bwd_carry_formulation_matches(rng, monkeypatch):
    """VQAX_GRU_BWD=carry (dw accumulated in the scan carry, the old
    formulation) matches the default hoisted-einsum dw/db exactly."""
    monkeypatch.setenv("VQAX_GRU_BWD", "carry")
    test_pallas_gru_gradients_match(rng)


def test_gather_rows_matches_take(rng):
    from vqa_project_tpu.ops.pallas.gather_rows import gather_rows

    tbl = jnp.asarray(rng.normal(size=(20, 8, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 20, 13).astype(np.int32))
    got = np.asarray(gather_rows(tbl, rows, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(tbl)[np.asarray(rows)])


def test_pallas_gather_training_bit_identical(tmp_path):
    """fit() with pallas_gather=True (interpret mode on CPU) produces
    bit-identical parameters to the jnp.take cache gather — the kernel
    is a pure data-movement swap."""
    from vqa_project_tpu.config import ModelConfig, TrainConfig
    from vqa_project_tpu.data import GraphVQADataset
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.train.loop import fit

    d = str(tmp_path / "synth")
    generate_synthetic_vqa(d, n_images=12, n_questions=96, n_obj=8,
                           feat_dim=24, q_vocab=20, n_answers=8)
    mcfg = ModelConfig(emb_dim=24, hid_dim=32, combined_dim=16,
                       n_kernels=4, neighbourhood_size=4, dropout=0.1,
                       max_qlen=10, compute_dtype="float32")

    def run(pallas_gather):
        ds = GraphVQADataset.vqa2(d, "train", n_obj=8, max_qlen=10)
        tcfg = TrainConfig(lr=1e-3, epochs=1, batch_size=16,
                           eval_interval=0, log_interval=1000,
                           num_devices=1, pallas_gather=pallas_gather)
        _, state, _ = fit(tcfg, mcfg, ds)
        return jax.tree.leaves(state.params)

    for a, b in zip(run(False), run(True)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_table_roundtrip_and_packable():
    from vqa_project_tpu.ops.pallas.gather_rows import pack_table, packable

    # real shapes: f32 sublane 8, bf16 sublane 16 — both pack
    assert packable((10, 36, 2048), np.float32)
    assert packable((10, 36, 2048), jnp.bfloat16)
    # 36*5 = 180 doesn't divide 8*128
    assert not packable((10, 36, 5), np.float32)
    tbl = np.arange(7 * 36 * 2048, dtype=np.float32).reshape(7, 36, 2048)
    packed = pack_table(tbl)
    assert packed.shape == (7, 8, 36 * 2048 // 8)
    np.testing.assert_array_equal(
        np.asarray(packed).reshape(7, 36, 2048), tbl)


@pytest.mark.parametrize("b", [8, 16, 33])
def test_gather_rows_dma_matches_take(rng, b):
    """Ring-buffered DMA gather == table[rows], incl. b below/at/over
    the ring depth (16)."""
    from vqa_project_tpu.ops.pallas.gather_rows import gather_rows_dma

    tbl = jnp.asarray(rng.standard_normal((40, 8, 256)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 40, b).astype(np.int32))
    got = np.asarray(gather_rows_dma(tbl, rows, interpret=True))
    np.testing.assert_array_equal(got, np.asarray(tbl)[np.asarray(rows)])


def test_packed_cache_image_fn_matches_take_on_mesh():
    """The 3-tuple (packed, boxes, (k, f)) cache path — DMA kernel under
    shard_map on the virtual 8-device mesh — returns the same features
    as the take path."""
    from vqa_project_tpu.ops.pallas.gather_rows import pack_table
    from vqa_project_tpu.parallel import make_mesh, replicate, shard_batch
    from vqa_project_tpu.train.steps import make_image_fn

    rng = np.random.default_rng(0)
    n, k, f = 24, 8, 1024  # 8*1024 tile-aligns for f32
    feats = rng.standard_normal((n, k, f)).astype(np.float32)
    boxes = rng.standard_normal((n, k, 4)).astype(np.float32)
    mesh = make_mesh(8)
    packed = replicate(jnp.asarray(pack_table(feats)), mesh)
    boxes_d = replicate(jnp.asarray(boxes), mesh)
    rows = rng.integers(0, n, 32).astype(np.int32)
    rows_d = shard_batch({"r": rows}, mesh)["r"]

    image_fn, arrays = make_image_fn((packed, boxes_d, (k, f)), mesh=mesh)
    got_f, got_b = jax.jit(image_fn)(arrays, rows_d)
    np.testing.assert_array_equal(np.asarray(got_f), feats[rows])
    np.testing.assert_array_equal(np.asarray(got_b), boxes[rows])


def test_relu_epilogue_matches_reference(rng):
    """fused_edge_aggregate_act(relu=True) == relu(reference), forward
    and gradients (interpret). The dropout epilogue needs the TPU PRNG
    (no interpret lowering) — its semantics are validated on hardware:
    keep ratio, zero activations/grads on dropped units, 1/(1-p)
    scaling, per-seed determinism (see the round-2 commit)."""
    from vqa_project_tpu.ops.pallas.edge_aggregate import \
        fused_edge_aggregate_act

    adj, pseudo, proj, gparams = _inputs(rng)
    got = fused_edge_aggregate_act(adj, pseudo, proj, gparams, None,
                                   M, True, True, 0.0, True)
    want = jax.nn.relu(edge_aggregate_reference(
        adj, pseudo, proj, gparams, m=M, use_alpha=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    fa = lambda a, pr, g: jnp.sum(fused_edge_aggregate_act(
        a, pseudo, pr, g, None, M, True, True, 0.0, True) ** 2)
    fr = lambda a, pr, g: jnp.sum(jax.nn.relu(edge_aggregate_reference(
        a, pseudo, pr, g, m=M, use_alpha=True)) ** 2)
    ga = jax.grad(fa, argnums=(0, 1, 2))(adj, proj, gparams)
    gr = jax.grad(fr, argnums=(0, 1, 2))(adj, proj, gparams)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_merged_graph_block_matches_reference(rng):
    """ops/pallas/graph_block.py: the whole-block kernel (projections +
    both convs + activation tail in ONE call per direction) matches the
    chained XLA reference in forward and all 7 gradients. The block is
    numerically exact but measured slower end-to-end at the VQA dims
    (25.1k vs ~30k qa/s), so it ships default-off (VQAX_MERGED_BLOCK)."""
    from vqa_project_tpu.ops.pallas.graph_block import (
        fused_graph_block, fused_graph_block_reference)

    B_, K_, M_, N_, F1, D1, D2 = 4, 12, 5, 4, 68, 16, 8
    adj = jnp.asarray(rng.normal(size=(B_, K_, K_)).astype(np.float32))
    pseudo = jnp.asarray(np.stack(
        [rng.uniform(0, 1.5, (B_, K_, K_)),
         rng.uniform(-np.pi, np.pi, (B_, K_, K_))], -1).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B_, K_, F1)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(N_, F1, D1)) * .1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(N_, N_ * D1, D2)) * .1)
                     .astype(np.float32))
    gp = lambda: jnp.asarray(np.stack(
        [rng.uniform(.2, 1, N_), rng.uniform(-np.pi, np.pi, N_),
         rng.uniform(.2, 1, N_), rng.uniform(.2, 1, N_)]).astype(np.float32))
    gp1, gp2 = gp(), gp()

    got = fused_graph_block(adj, pseudo, feats, w1, gp1, w2, gp2,
                            None, M_, 0.0, True)
    want = fused_graph_block_reference(adj, pseudo, feats, w1, gp1,
                                       w2, gp2, m=M_)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

    fk = lambda *a: jnp.sum(fused_graph_block(*a, None, M_, 0.0, True) ** 2)
    fr = lambda *a: jnp.sum(fused_graph_block_reference(*a, m=M_) ** 2)
    gk = jax.grad(fk, argnums=tuple(range(7)))(adj, pseudo, feats, w1,
                                               gp1, w2, gp2)
    gr = jax.grad(fr, argnums=tuple(range(7)))(adj, pseudo, feats, w1,
                                               gp1, w2, gp2)
    for x, y in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-4)


def test_gru_xp_bf16_stream_close(rng, monkeypatch):
    """VQAX_GRU_XP_BF16=1 streams the hoisted projection in bf16; the
    result and gradients stay close to the f32-stream path (gate
    pre-activations are bf16-rounded, so tolerances are loose)."""
    import jax

    from vqa_project_tpu.ops.pallas import gru_encode_pallas

    b, t, e, h = 3, 6, 8, 12
    emb = rng.normal(size=(b, t, e)).astype(np.float32)
    qlen = np.array([6, 2, 4], dtype=np.int32)
    params = [
        (rng.normal(size=s) * 0.2).astype(np.float32)
        for s in [(3 * h, e), (3 * h, h), (3 * h,), (3 * h,)]
    ]
    jp = list(map(jnp.asarray, params))

    def loss(emb_, w_ih, w_hh, b_ih, b_hh):
        out = gru_encode_pallas(emb_, jnp.asarray(qlen), w_ih, w_hh,
                                b_ih, b_hh, compute_dtype=jnp.bfloat16,
                                interpret=True)
        return jnp.sum(out ** 2)

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))
    base = grad(jnp.asarray(emb), *jp)
    monkeypatch.setenv("VQAX_GRU_XP_BF16", "1")
    got = grad(jnp.asarray(emb), *jp)
    np.testing.assert_allclose(float(base[0]), float(got[0]),
                               rtol=5e-2)
    for a, b_ in zip(base[1], got[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=0.15, atol=0.05)
