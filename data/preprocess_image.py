#!/usr/bin/env python
"""Shim preserving `python data/preprocess_image.py --data trainval test`
(/root/reference/data/preprocess_image.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vqa_project_tpu.data.preprocess.image_features import main  # noqa: E402

if __name__ == "__main__":
    main()
