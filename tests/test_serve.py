"""Serving layer: dynamic batching, HTTP front-end, forward parity.

Net-new vs the reference (offline eval only, run.py:36-114)."""

import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_project_tpu.config import ModelConfig
from vqa_project_tpu.data import GraphVQADataset
from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
from vqa_project_tpu.serve import InferenceServer, make_http_server
from vqa_project_tpu.train.loop import build_model

N_OBJ, FEAT = 8, 24

MCFG = ModelConfig(emb_dim=24, hid_dim=32, combined_dim=16, n_kernels=4,
                   neighbourhood_size=4, dropout=0.1, max_qlen=10,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def served():
    import tempfile

    d = tempfile.mkdtemp(prefix="serve_synth_")
    generate_synthetic_vqa(d, n_images=12, n_questions=64, n_obj=N_OBJ,
                           feat_dim=FEAT, q_vocab=30, n_answers=9)
    ds = GraphVQADataset.vqa2(d, "val", n_obj=N_OBJ, max_qlen=10)
    model = build_model(MCFG, ds)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, ds.max_qlen), jnp.int32),
        jnp.zeros((2, ds.n_obj, ds.feat_dim), jnp.float32),
        jnp.ones((2,), jnp.int32))
    srv = InferenceServer(model, params, ds, batch_size=4,
                          max_wait_ms=30.0, top_k=3)
    yield srv, model, params, ds
    srv.close()


def test_predict_by_image_id(served):
    srv, _, _, ds = served
    iid = next(iter(ds.store.id_to_row))
    out = srv.predict("what color is this", image_id=iid)
    assert out["answer"] in ds.a_itow.values()
    assert len(out["top_k"]) == 3
    probs = [t["prob"] for t in out["top_k"]]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_predict_matches_direct_forward(served):
    """The padded-batch server answer == an unbatched model.apply."""
    srv, model, params, ds = served
    iid = next(iter(ds.store.id_to_row))
    row = ds.store.id_to_row[iid]
    out = srv.predict("is there a dog", image_id=iid)

    from vqa_project_tpu.data.preprocess.text import tokenize

    toks = np.zeros((1, ds.max_qlen), np.int32)
    words = tokenize("is there a dog")
    for i, w in enumerate(words):
        toks[0, i] = ds.q_wtoi.get(w, 0)
    image = np.concatenate(
        [ds.store.features[row], ds.store.boxes[row]], -1)[None]
    logits, _, _ = model.apply(params, jnp.asarray(toks),
                               jnp.asarray(image, jnp.float32),
                               jnp.asarray([len(words)], jnp.int32),
                               train=False)
    l = np.array(logits)[0]
    l[-1] = -np.inf  # padding answer column, excluded by the server too
    want = ds.a_itow.get(int(np.argmax(l)), "<unk>")
    assert out["answer"] == want


def test_dynamic_batching_coalesces(served):
    """Concurrent submits share batches (batch_size > 1 observed) and
    every request gets its own answer."""
    srv, _, _, ds = served
    iids = list(ds.store.id_to_row)
    futs = [srv.submit(f"how many objects {i}", image_id=iids[i % len(iids)])
            for i in range(12)]
    outs = [f.result(timeout=60) for f in futs]
    assert len(outs) == 12
    assert max(o["batch_size"] for o in outs) > 1
    assert srv.requests_served >= 12


def test_raw_features_and_errors(served):
    srv, _, _, ds = served
    feats = np.zeros((N_OBJ, FEAT), np.float32)
    boxes = np.tile(np.asarray([0.1, 0.1, 0.5, 0.5], np.float32),
                    (N_OBJ, 1))
    out = srv.predict("what is this", features=feats, boxes=boxes)
    assert "answer" in out
    with pytest.raises(KeyError):
        srv.predict("q", image_id="nope-not-an-image")
    with pytest.raises(ValueError):
        srv.predict("q", features=np.zeros((2, 2), np.float32),
                    boxes=boxes)
    with pytest.raises(ValueError):
        srv.predict("q")  # neither image_id nor features


def test_http_roundtrip(served):
    srv, _, _, ds = served
    httpd = make_http_server(srv, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = http.client.HTTPConnection(host, port, timeout=30)

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["batch_size"] == 4
        # warmup is required to BLOCK in __init__ (fetch, not just
        # dispatch) — by construction time it has a measured duration
        assert health["warmup_s"] > 0

        iid = next(iter(ds.store.id_to_row))
        conn.request("POST", "/predict", body=json.dumps(
            {"question": "what color", "image_id": iid}))
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert out["answer"] in ds.a_itow.values()

        # keep-alive (HTTP/1.1): every body must be read before the
        # connection can carry the next request — and the requests
        # below REUSING one connection is itself the keep-alive test
        conn.request("POST", "/predict", body=json.dumps(
            {"question": "no image"}))
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        conn.request("POST", "/predict", body=json.dumps(
            {"question": "q", "features": [[0.0] * 24] * 8}))
        resp = conn.getresponse()
        assert resp.status == 400
        assert "boxes" in json.loads(resp.read())["error"]

        conn.request("GET", "/nope")
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()

        # POST with a body to an unknown path: the handler must DRAIN
        # the body before responding 404 — an unread body under
        # HTTP/1.1 keep-alive is parsed as the next request line,
        # desyncing the connection so the next legitimate request on
        # it gets a bogus 400
        conn.request("POST", "/predict/v2", body=json.dumps(
            {"question": "typo'd path", "image_id": "x"}))
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        iid2 = next(iter(ds.store.id_to_row))
        conn.request("POST", "/predict", body=json.dumps(
            {"question": "still in sync", "image_id": iid2}))
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
    finally:
        httpd.shutdown()


def test_multichip_serving_parity(served):
    """mesh= serving (padded batch sharded over the 8-device data mesh,
    params replicated — the trainer's SPMD recipe) answers identically
    to the single-chip server, and really places batches on all chips
    (VERDICT round 3 item 8)."""
    import time

    from vqa_project_tpu.parallel import make_mesh

    srv1, model, params, ds = served
    mesh = make_mesh()
    srv8 = InferenceServer(model, params, ds, batch_size=8,
                           max_wait_ms=30.0, top_k=3, mesh=mesh)
    try:
        # sharded placement actually engages
        probe = srv8._put(np.zeros((8, 4), np.float32))
        assert len(probe.sharding.device_set) == mesh.devices.size
        iids = list(ds.store.id_to_row)
        qs = [f"what colour is object {i}" for i in range(8)]
        outs1 = [srv1.predict(q, image_id=iids[i % len(iids)])
                 for i, q in enumerate(qs)]
        futs = [srv8.submit(q, image_id=iids[i % len(iids)])
                for i, q in enumerate(qs)]
        outs8 = [f.result(timeout=120) for f in futs]
        for a, b in zip(outs1, outs8):
            assert a["answer"] == b["answer"]
            np.testing.assert_allclose(
                [t["prob"] for t in a["top_k"]],
                [t["prob"] for t in b["top_k"]], rtol=1e-5, atol=1e-6)
        # throughput probe (not a perf assertion: virtual CPU mesh):
        # full saturated batches through the sharded forward
        t0 = time.perf_counter()
        futs = [srv8.submit(qs[i % 8], image_id=iids[i % len(iids)])
                for i in range(32)]
        [f.result(timeout=120) for f in futs]
        dt = time.perf_counter() - t0
        print(f"\nmulti-chip serve: {32 / dt:.0f} req/s over "
              f"{mesh.devices.size} virtual devices")
    finally:
        srv8.close()
    with pytest.raises(ValueError, match="not divisible"):
        InferenceServer(model, params, ds, batch_size=6, mesh=mesh)


def test_worker_survives_batch_failure(served):
    """A failure anywhere in batch serving (not just the forward) fails
    THAT batch's futures and leaves the worker alive for later requests
    (ADVICE round 2: a dead worker used to hang every future caller)."""
    srv, _, _, ds = served
    iid = next(iter(ds.store.id_to_row))

    class Boom:
        def get(self, *a, **k):
            raise RuntimeError("answer table exploded")

    real = srv.ds.a_itow
    srv.ds.a_itow = Boom()  # fails inside result assembly, post-forward
    try:
        with pytest.raises(RuntimeError, match="exploded"):
            srv.predict("what color", image_id=iid, timeout=30)
    finally:
        srv.ds.a_itow = real
    # the worker thread must still be alive and serving
    assert srv._worker.is_alive()
    out = srv.predict("what color", image_id=iid, timeout=30)
    assert out["answer"] in ds.a_itow.values()
