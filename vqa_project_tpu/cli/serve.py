"""Serving front-end: `python -m vqa_project_tpu.cli.serve`.

Loads a checkpoint + dataset artifacts and exposes the dynamic-batching
inference server (serve.py) over HTTP. Net-new vs the reference (which
only has offline eval, run.py:36-114).

  python -m vqa_project_tpu.cli.serve --model_path save/vqa_....pt \
      --data_dir ./data --port 8000
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/predict \
      -d '{"question": "what color is the bus", "image_id": "123"}'
"""

from __future__ import annotations

import argparse
import os
import sys


def input_args(argv=None):
    p = argparse.ArgumentParser(description="VQA inference server")
    p.add_argument("--model_path", type=str, required=False)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--split", type=str, default="val",
                   help="split whose FeatureStore serves image_id lookups")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--bsize", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--num_devices", type=int, default=1,
                   help="chips to serve one batch on (default 1: this "
                        "model saturates a chip before the HTTP "
                        "front-end does — scale by replica; >1 shards "
                        "each padded batch over a data mesh, 0 = all)")
    # model hyper-params must match the checkpoint (same flags as run.py)
    p.add_argument("--emb", type=int, default=300)
    p.add_argument("--hid", type=int, default=1024)
    p.add_argument("--n_kernels", type=int, default=8)
    p.add_argument("--neighbourhood_size", type=int, default=16)
    p.add_argument("--n_obj", type=int, default=36)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="int8 projection weights (ops/quant.py): ~2x "
                        "MXU rate on the conv GEMMs, +12%% measured "
                        "end-to-end eval throughput")
    from vqa_project_tpu.cli.run import add_synthetic_args

    add_synthetic_args(p)
    return p.parse_args(argv)


def build_server(args):
    """Construct the InferenceServer (split out for tests)."""
    from vqa_project_tpu.cli.run import _dataset, restore_params
    from vqa_project_tpu.config import ModelConfig
    from vqa_project_tpu.serve import InferenceServer
    from vqa_project_tpu.train.loop import build_model
    from vqa_project_tpu.train.state import load_checkpoint

    ds = _dataset(args, args.split)
    mcfg = ModelConfig(
        emb_dim=args.emb, hid_dim=args.hid, n_kernels=args.n_kernels,
        neighbourhood_size=args.neighbourhood_size, n_obj=args.n_obj,
        dropout=args.dropout, compute_dtype=args.compute_dtype,
        use_pallas=(True if args.pallas
                    else False if args.no_pallas else "auto"))
    model = build_model(mcfg, ds)
    if args.model_path and os.path.isfile(args.model_path):
        payload, _ = load_checkpoint(args.model_path, None)
        params = restore_params(model, ds, payload)
        print(f"Loaded {args.model_path}")
    else:
        print("No --model_path; serving RANDOM weights (smoke mode)",
              file=sys.stderr)
        import jax
        import jax.numpy as jnp

        params = model.init(
            jax.random.key(0),
            jnp.zeros((2, ds.max_qlen), jnp.int32),
            jnp.zeros((2, ds.n_obj, ds.feat_dim), jnp.float32),
            jnp.ones((2,), jnp.int32))
    if getattr(args, "quantize", False):
        import dataclasses

        from vqa_project_tpu.ops.quant import quantize_params_for_serving

        model = build_model(
            dataclasses.replace(mcfg, quantized_inference=True), ds)
        params = quantize_params_for_serving(params)
        print("int8 projection weights (serving quantization) on")
    mesh = None
    nd = getattr(args, "num_devices", 1)
    if nd != 1:
        from vqa_project_tpu.parallel import make_mesh

        mesh = make_mesh(None if nd == 0 else nd)
    return InferenceServer(model, params, ds, batch_size=args.bsize,
                           max_wait_ms=args.max_wait_ms, top_k=args.top_k,
                           mesh=mesh)


def main(argv=None):
    from vqa_project_tpu.serve import make_http_server
    from vqa_project_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    args = input_args(argv)
    server = build_server(args)
    httpd = make_http_server(server, args.port, args.host)
    host, port = httpd.server_address[:2]
    print(f"serving on http://{host}:{port} "
          f"(batch {server.batch_size}, wait {server.max_wait_ms} ms)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == "__main__":
    main()
