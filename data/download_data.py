#!/usr/bin/env python
"""Shim preserving `python data/download_data.py`
(/root/reference/data/download_data.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vqa_project_tpu.data.preprocess.download import main  # noqa: E402

if __name__ == "__main__":
    main()
