#!/usr/bin/env python
"""Load-test the serving HTTP front-end: concurrent keep-alive clients
against POST /predict on a synthetic model.

Round-4 verdict item 5: README's serving decision (single chip per
replica) rested on an ESTIMATE that the stdlib front-end sustains ~3
orders of magnitude less than the 124k/s jitted forward — this tool
turns the estimate into a measured requests/s figure.

    python tools/serve_loadtest.py --clients 16 --seconds 5

Runs on CPU by default (a tiny model keeps the forward out of the
bottleneck — the point is the FRONT-END ceiling: HTTP parse, JSON,
queue hop, dynamic batching, response write). One JSON line on stdout:
{"requests_per_sec": ..., "p50_ms": ..., "p99_ms": ..., ...}

Serving is net-new vs the reference (its eval loop is offline,
/root/reference/run.py:36-114).
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: measures the front-end, not the "
                         "chip) or empty to keep the session backend")
    ap.add_argument("--data_dir", default="/tmp/vqax_loadtest")
    ap.add_argument("--null_forward", action="store_true",
                    help="replace the jitted forward with a host-side "
                         "constant: measures the PURE front-end ceiling "
                         "(HTTP parse, JSON, queue hop, batching, "
                         "response write) with zero model time")
    args = ap.parse_args()

    if args.platform:
        # an inherited XLA_FLAGS (tests/conftest.py exports an 8-device
        # --xla_force_host_platform_device_count) would change the
        # device topology under the measurement — drop it
        os.environ.pop("XLA_FLAGS", None)
        import jax

        jax.config.update("jax_platforms", args.platform)

    from vqa_project_tpu.config import ModelConfig
    from vqa_project_tpu.data.datasets import GraphVQADataset
    from vqa_project_tpu.data.synthetic import generate_synthetic_vqa
    from vqa_project_tpu.models import GraphVQAModel
    from vqa_project_tpu.serve import InferenceServer, make_http_server

    import jax

    sdir = os.path.join(args.data_dir, "synthetic")
    if not os.path.exists(os.path.join(sdir, "fingerprint.json")):
        generate_synthetic_vqa(sdir, with_test=False)
        with open(os.path.join(sdir, "fingerprint.json"), "w") as f:
            json.dump({"tool": "serve_loadtest"}, f)
    ds = GraphVQADataset.vqa2(sdir, "val", 300, 36)

    cfg = ModelConfig(vocab_size=ds.q_words, emb_dim=32, hid_dim=64,
                      out_dim=ds.n_answers, combined_dim=32, n_kernels=4,
                      neighbourhood_size=5, n_obj=ds.n_obj,
                      feat_dim=ds.feat_dim, max_qlen=ds.max_qlen,
                      compute_dtype="float32", use_pallas=False)
    model = GraphVQAModel(cfg=cfg)
    import numpy as np

    params = model.init(jax.random.key(0),
                        np.zeros((1, ds.max_qlen), np.int32),
                        np.zeros((1, ds.n_obj, ds.feat_dim), np.float32),
                        np.ones((1,), np.int32))
    srv = InferenceServer(model, params, ds,
                          batch_size=args.batch_size,
                          max_wait_ms=args.max_wait_ms)
    if args.null_forward:
        zv = np.zeros((args.batch_size, srv.top_k), np.float32)
        zi = np.zeros((args.batch_size, srv.top_k), np.int32)
        srv._forward = lambda *a, **k: (zv, zi)
    httpd = make_http_server(srv, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    image_id = next(iter(ds.store.id_to_row))
    body = json.dumps({"question": "what color is the thing",
                       "image_id": image_id}).encode()

    # warm one request through (first /predict replays the cached
    # executable but still pays dispatch setup)
    conn = http.client.HTTPConnection("127.0.0.1", port)
    conn.request("POST", "/predict", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, resp.read()
    resp.read()
    conn.close()

    stop_at = time.monotonic() + args.seconds
    counts = [0] * args.clients
    lat_ms: list = [[] for _ in range(args.clients)]
    errors = [0] * args.clients

    def client(i: int):
        c = http.client.HTTPConnection("127.0.0.1", port)
        while time.monotonic() < stop_at:
            t0 = time.monotonic()
            try:
                c.request("POST", "/predict", body,
                          {"Content-Type": "application/json"})
                r = c.getresponse()
                data = r.read()
                if r.status != 200:
                    errors[i] += 1
                    continue
                json.loads(data)
            except (http.client.HTTPException, OSError):
                errors[i] += 1
                c.close()
                c = http.client.HTTPConnection("127.0.0.1", port)
                continue
            counts[i] += 1
            lat_ms[i].append((time.monotonic() - t0) * 1e3)
        c.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t_start

    all_lat = sorted(x for li in lat_ms for x in li)
    n = sum(counts)

    def pct(p):
        return all_lat[min(len(all_lat) - 1,
                           int(p / 100 * len(all_lat)))] if all_lat else 0

    print(json.dumps({
        "requests_per_sec": round(n / elapsed, 1),
        "n_requests": n,
        "errors": sum(errors),
        "clients": args.clients,
        "seconds": round(elapsed, 2),
        "batch_size": args.batch_size,
        "mean_batch_fill": round(srv.requests_served
                                 / max(srv.batches_served, 1), 2),
        "p50_ms": round(pct(50), 2),
        "p99_ms": round(pct(99), 2),
        "http_version": "keep-alive" if all_lat else "n/a",
    }))
    httpd.shutdown()
    srv.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
