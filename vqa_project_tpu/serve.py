"""Online inference serving: dynamic batching over a jitted forward.

The reference has no serving story (its eval loop is offline,
run.py:36-114); this is the TPU-native deployment surface. Design:

- ONE compiled executable: requests are padded into a fixed
  (batch_size, ...) shape, so the forward jit-compiles once and every
  batch replays it (XLA recompiles on any shape change — fixed shapes
  are the serving-side analogue of the trainer's fixed-shape Batcher).
- Dynamic batching: a worker thread drains the request queue, waiting
  at most max_wait_ms for the batch to fill. Full batches amortize the
  per-dispatch cost; the wait bound keeps tail latency low at low QPS.
- The feature lookup runs host-side from the dataset's memmapped
  FeatureStore (image_id -> row); at serving batch sizes the H2D of one
  (B, K, F) block is small. Raw features can also be supplied per
  request (for images outside the store).
- Multi-chip (opt-in via mesh=): the padded batch shards over the data
  axis and params replicate — the trainer's SPMD recipe applied to the
  forward. Single-chip stays the default deployment (see __init__).

Thread-safety: jax dispatch happens only on the worker thread;
submitters block on a per-request Future.
"""

from __future__ import annotations

import json
import queue
import threading
from dataclasses import dataclass, field
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from vqa_project_tpu.data.preprocess.text import tokenize


@dataclass
class _Request:
    tokens: np.ndarray          # (T,) int32, already padded/truncated
    qlen: int
    features: np.ndarray        # (K, feat_dim - 4)
    boxes: np.ndarray           # (K, 4)
    future: Future = field(default_factory=Future)


class InferenceServer:
    """Dynamic-batching VQA inference over a fixed-shape jitted forward.

    model/params: a GraphVQAModel and its (possibly imported) params.
    ds: a GraphVQADataset — supplies the question vocab (q_wtoi), the
        answer strings (a_itow) and the FeatureStore for image lookup.
    """

    def __init__(self, model, params, ds, *, batch_size: int = 16,
                 max_wait_ms: float = 5.0, top_k: int = 5,
                 mesh=None, data_axis: str = "data"):
        import jax
        import jax.numpy as jnp

        self.ds = ds
        self.batch_size = int(batch_size)
        self.max_wait_ms = float(max_wait_ms)
        self.top_k = int(min(top_k, ds.n_answers - 1))
        # Multi-chip serving: with a mesh, params replicate across it and
        # every padded batch shards on the data axis — the trainer's
        # exact SPMD recipe (parallel/mesh.py), so the jitted forward
        # fans out over chips with an argmax-sized collective at the end.
        # Default (mesh=None) is deliberate single-chip: the README
        # records the measured single-chip rate and the decision rule
        # (this model saturates one chip long before one HTTP front-end
        # does; scale by replica, shard only when a single batch must
        # exceed one chip's HBM/latency budget).
        self._mesh = mesh if (mesh is not None
                              and mesh.devices.size > 1) else None
        if self._mesh is not None:
            from vqa_project_tpu.parallel import replicate
            from vqa_project_tpu.parallel.mesh import batch_sharding, \
                put_named

            n = self._mesh.shape[data_axis]
            if self.batch_size % n:
                raise ValueError(f"batch_size {self.batch_size} not "
                                 f"divisible by {n} data-parallel chips")
            params = replicate(params, self._mesh)
            bsh = batch_sharding(self._mesh, data_axis)
            self._put = lambda a: put_named(np.asarray(a), bsh)
        else:
            self._put = jnp.asarray
        self._params = params
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self.batches_served = 0
        self.requests_served = 0

        t = ds.max_qlen
        k, fdim = ds.n_obj, ds.feat_dim

        def forward(params, q, image, qlen):
            logits, _, _ = model.apply(params, q, image, qlen, train=False)
            # column n_answers-1 is the padding answer slot (the '+1'
            # of torch_dataset.py:54,117) — never a servable answer
            logits = logits.at[:, -1].set(-jnp.inf)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            top = jax.lax.top_k(probs, self.top_k)
            return top  # (values, indices), each (B, top_k)

        self._forward = jax.jit(forward)
        self._shapes = (t, k, fdim)
        # warm the executable before accepting work: the first real
        # request must not pay the XLA compile inside its latency.
        # The warmup must FETCH a value, not just dispatch: on remote
        # backends (axon tunnel) the jit call returns before the remote
        # compile/execution completes, so a dispatch-only warmup reports
        # the server ready while the first real batch then blocks for
        # the full cold compile (minutes on a cold Mosaic path) inside
        # the worker — and every request in that window dies with an
        # opaque 60 s TimeoutError instead of waiting for warmth.
        import sys as _sys
        import time as _time

        import numpy as _np

        _t0 = _time.monotonic()
        _vals, _ = self._forward(
            params,
            self._put(_np.zeros((self.batch_size, t), _np.int32)),
            self._put(_np.zeros((self.batch_size, k, fdim),
                                _np.float32)),
            self._put(_np.ones((self.batch_size,), _np.int32)))
        _np.asarray(_vals)  # blocks until the executable truly ran
        self.warmup_s = _time.monotonic() - _t0
        if self.warmup_s > 5:
            print(f"forward warm after {self.warmup_s:.0f}s (cold "
                  f"compile; cached for next start)", file=_sys.stderr)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---------------- public API ----------------

    def submit(self, question: str,
               image_id: Optional[str] = None,
               features: Optional[np.ndarray] = None,
               boxes: Optional[np.ndarray] = None) -> Future:
        """Queue one request; the Future resolves to the response dict."""
        t, k, fdim = self._shapes
        toks = np.zeros((t,), np.int32)
        words = tokenize(question)[:t]
        for i, w in enumerate(words):
            toks[i] = self.ds.q_wtoi.get(w, 0)
        qlen = max(1, len(words))

        if features is None:
            if image_id is None:
                raise ValueError("need image_id or features")
            id_to_row = self.ds.store.id_to_row
            row = id_to_row.get(image_id, id_to_row.get(str(image_id)))
            if row is None:
                raise KeyError(f"unknown image_id {image_id!r}")
            features = np.asarray(self.ds.store.features[row])
            boxes = np.asarray(self.ds.store.boxes[row])
        features = np.asarray(features, np.float32)
        boxes = np.asarray(boxes, np.float32)
        if features.shape != (k, fdim - 4) or boxes.shape != (k, 4):
            raise ValueError(
                f"features/boxes must be {(k, fdim - 4)}/{(k, 4)}, got "
                f"{features.shape}/{boxes.shape}")

        req = _Request(toks, qlen, features, boxes)
        self._queue.put(req)
        return req.future

    def predict(self, question: str, timeout: Optional[float] = 60.0,
                **kw) -> Dict[str, Any]:
        """Blocking submit(). timeout bounds the wait so a wedged worker
        surfaces as concurrent.futures.TimeoutError instead of a hang."""
        return self.submit(question, **kw).result(timeout)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # ---------------- worker ----------------

    def _drain(self) -> List[_Request]:
        """Block for one request, then take more until the batch fills
        or max_wait_ms passes."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.max_wait_ms / 1e3
        import time

        t0 = time.monotonic()
        while len(batch) < self.batch_size:
            left = deadline - (time.monotonic() - t0)
            if left <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=left))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            try:
                self._serve_batch(batch)
            except Exception as e:
                # batch assembly / bookkeeping failure: fail THIS batch's
                # futures and keep the worker alive — otherwise every
                # pending and future predict() blocks forever on a dead
                # thread (ADVICE round 2)
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _serve_batch(self, batch: List[_Request]):
        t, k, fdim = self._shapes
        b = self.batch_size
        n = len(batch)
        q = np.zeros((b, t), np.int32)
        qlen = np.ones((b,), np.int32)
        image = np.zeros((b, k, fdim), np.float32)
        for i, r in enumerate(batch):
            q[i] = r.tokens
            qlen[i] = r.qlen
            image[i, :, :fdim - 4] = r.features
            image[i, :, fdim - 4:] = r.boxes
        vals, idxs = self._forward(
            self._params, self._put(q), self._put(image), self._put(qlen))
        vals = np.asarray(vals)
        idxs = np.asarray(idxs)
        self.batches_served += 1
        self.requests_served += n
        for i, r in enumerate(batch):
            top = [{"answer": self.ds.a_itow.get(int(j), "<unk>"),
                    "prob": float(v)}
                   for j, v in zip(idxs[i], vals[i])]
            r.future.set_result(
                {"answer": top[0]["answer"], "top_k": top,
                 "batch_size": n})


# ---------------- HTTP front-end ----------------


def make_http_server(server: InferenceServer, port: int = 0,
                     host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """POST /predict {"question": ..., "image_id"} or
    {"question": ..., "features", "boxes"}
    -> {"answer", "top_k", "batch_size"}; GET /healthz -> stats.
    Returns the (not yet serving) ThreadingHTTPServer; call
    serve_forever() or poll it from a thread. port=0 picks a free port
    (read it from .server_address)."""

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 => persistent connections: stdlib defaults to 1.0,
        # which closes the socket after every response and caps the
        # front-end at connection-setup rate (~2.4x slower measured,
        # tools/serve_loadtest.py). Safe because _json always sends
        # Content-Length.
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "requests_served": server.requests_served,
                    "batches_served": server.batches_served,
                    "batch_size": server.batch_size,
                    "warmup_s": round(server.warmup_s, 3)})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            # drain the body BEFORE any response: under HTTP/1.1
            # keep-alive an unread body is parsed as the next request
            # line, desyncing the connection (the next legitimate
            # request on it would get a bogus 400)
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                n = 0
            body = self.rfile.read(n) if n > 0 else b""
            if self.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                payload = json.loads(body or b"{}")
                kw = {}
                if "features" in payload:
                    if "boxes" not in payload:
                        raise ValueError(
                            "\"features\" requires \"boxes\" "
                            "(K x 4 normalized xyxy)")
                    kw["features"] = np.asarray(payload["features"],
                                                np.float32)
                    kw["boxes"] = np.asarray(payload["boxes"],
                                             np.float32)
                else:
                    kw["image_id"] = payload.get("image_id")
                out = server.predict(payload["question"], **kw)
                self._json(200, out)
            except (KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # forward/runtime failure -> 500
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    class Server(ThreadingHTTPServer):
        # stdlib default listen backlog is 5: a burst of >5 simultaneous
        # connects (e.g. a replica coming back into a load balancer)
        # gets TCP resets. 128 is the usual somaxconn-bounded value.
        request_queue_size = 128

    return Server((host, port), Handler)
