"""Bottom-up-attention TSV -> zarr feature stores.

Parity target: /root/reference/data/preprocess_image.py. Consumes the
same Faster-R-CNN 36-box TSVs (image_id, image_w, image_h, num_boxes,
boxes, features with base64-packed float32 payloads) and emits the same
artifacts: {phase}.zarr, {phase}_boxes.zarr, {phase}_image_size.csv
(columns = image ids, row 0 width, row 1 height).
"""

from __future__ import annotations

import argparse
import base64
import csv
import os
import sys
from typing import Dict, List

import numpy as np

from vqa_project_tpu.data.zarr_store import ZarrWriter

csv.field_size_limit(sys.maxsize)

FIELDNAMES = ["image_id", "image_w", "image_h",
              "num_boxes", "boxes", "features"]

DEFAULT_TSVS = {
    "trainval": ["trainval_36/"
                 "trainval_resnet101_faster_rcnn_genome_36.tsv"],
    "test": ["test2015_36/"
             "test2015_resnet101_faster_rcnn_genome_36.tsv"],
}


def features_to_zarr(phase: str, infiles: List[str] = None,
                     out_dir: str = ".", raw_dir: str = "raw") -> None:
    """infiles=None resolves the published TSV layout under raw_dir
    (the downloader unzips into <data>/raw/ — reference
    data/preprocess_image.py assumes a CWD-relative 'raw/'; taking
    raw_dir explicitly lets the RUNBOOK commands run from anywhere)."""
    if infiles is None:
        names = DEFAULT_TSVS.get(phase)
        if not names:
            raise SystemExit("Unrecognised phase")
        infiles = [os.path.join(raw_dir, n) for n in names]

    boxes = ZarrWriter(os.path.join(out_dir, f"{phase}_boxes.zarr"))
    features = ZarrWriter(os.path.join(out_dir, f"{phase}.zarr"))
    image_size: Dict[str, tuple] = {}
    for infile in infiles:
        with open(infile, "r") as f:
            reader = csv.DictReader(f, delimiter="\t",
                                    fieldnames=FIELDNAMES)
            print(f"Converting {infile} to zarr...")
            for item in reader:
                iid = str(item["image_id"])
                n = int(item["num_boxes"])
                arrs = {}
                for field in ("boxes", "features"):
                    raw = base64.decodebytes(item[field].encode("utf-8"))
                    arrs[field] = np.frombuffer(
                        raw, dtype=np.float32).reshape(n, -1)
                boxes.create_dataset(iid, arrs["boxes"])
                features.create_dataset(iid, arrs["features"])
                image_size[iid] = (int(item["image_w"]),
                                   int(item["image_h"]))

    print("Writing image sizes csv...")
    from vqa_project_tpu.data.datasets import write_sizes_csv

    write_sizes_csv(os.path.join(out_dir, f"{phase}_image_size.csv"),
                    image_size)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Preprocessing for VQA v2 image data (TPU-native)")
    p.add_argument("--data", nargs="+", default=["trainval", "test"])
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--raw_dir", type=str, default="raw",
                   help="directory the downloader unzipped the TSV "
                        "archives into (default: ./raw)")
    args, unparsed = p.parse_known_args(argv)
    if unparsed:
        raise SystemExit(f"Unknown argument: {unparsed}")
    for phase in args.data:
        print("Converting features tsv to zarr file...")
        features_to_zarr(phase, out_dir=args.out_dir,
                         raw_dir=args.raw_dir)
    print("Done")


if __name__ == "__main__":
    main()
