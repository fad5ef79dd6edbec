"""VQA v2 raw-artifact downloader.

Parity target: /root/reference/data/download_data.py (same URLs and
layout: QA jsons + GloVe 6B into the data dir, Faster-R-CNN 36-box
feature TSVs into raw/). Uses subprocess instead of os.system and skips
files that already exist.
"""

from __future__ import annotations

import argparse
import os
import subprocess

URLS = {
    "questions_train":
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Train_mscoco.zip",
    "questions_val":
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Val_mscoco.zip",
    "questions_test":
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Test_mscoco.zip",
    "annotations_train":
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Annotations_Train_mscoco.zip",
    "annotations_val":
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Annotations_Val_mscoco.zip",
    "glove": "http://nlp.stanford.edu/data/glove.6B.zip",
    "features_trainval":
        "https://imagecaption.blob.core.windows.net/imagecaption/"
        "trainval_36.zip",
    "features_test":
        "https://imagecaption.blob.core.windows.net/imagecaption/"
        "test2015_36.zip",
}


def fetch(url: str, dest_dir: str, unzip: bool = True):
    """Resumable fetch: download to <name>.part with wget -c (an
    interrupted multi-GB feature TSV resumes instead of restarting),
    verify zip integrity, then atomically rename — so a completed
    `name` on disk is always a whole, tested file and re-running the
    downloader after any crash just continues."""
    os.makedirs(dest_dir, exist_ok=True)
    name = os.path.join(dest_dir, url.rsplit("/", 1)[1])
    if not os.path.exists(name):
        part = name + ".part"
        subprocess.run(["wget", "-q", "-c", "-O", part, url], check=True)
        if part.endswith(".zip.part"):
            subprocess.run(["unzip", "-t", "-q", part], check=True)
        os.replace(part, name)
    if unzip and name.endswith(".zip"):
        subprocess.run(["unzip", "-o", "-q", name, "-d", dest_dir],
                       check=True)


def main(argv=None):
    p = argparse.ArgumentParser(description="Download VQA v2 raw data")
    p.add_argument("--out_dir", type=str, default=".")
    p.add_argument("--skip_features", action="store_true",
                   help="skip the ~60 GB feature TSVs")
    args, unparsed = p.parse_known_args(argv)
    if unparsed:
        raise SystemExit(f"Unknown argument: {unparsed}")

    raw = os.path.join(args.out_dir, "raw")
    for key, url in URLS.items():
        if args.skip_features and key.startswith("features"):
            continue
        dest = args.out_dir if key == "glove" else raw
        print(f"fetching {key} ...")
        fetch(url, dest)
    print("Done")


if __name__ == "__main__":
    main()
