"""Convert a TPU checkpoint to the reference's torch format.

Closes the interop loop: `torch_import` ingests the reference's
checkpoints (/root/reference/utils.py:34-44 bare state_dict and the
run.py:176-181 full-dict resume format); this tool writes the bare
state_dict form back out, so a model trained here can be loaded by the
reference's eval/plot stack (run.py:84-86 model.load_state_dict)
unchanged.

Usage:
    python -m vqa_project_tpu.cli.export_torch <ckpt.msgpack|.pt> <out.pt>
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="framework checkpoint (msgpack)")
    ap.add_argument("out", help="output torch .pt path")
    args = ap.parse_args(argv)

    from vqa_project_tpu.models.torch_import import save_torch_checkpoint
    from vqa_project_tpu.train.state import load_checkpoint

    payload, _ = load_checkpoint(args.checkpoint)
    save_torch_checkpoint(args.out, payload["params"])
    print(f"wrote {args.out} (reference state_dict format)")


if __name__ == "__main__":
    main()
