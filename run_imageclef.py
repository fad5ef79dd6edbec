#!/usr/bin/env python
"""Repo-root shim preserving `python run_imageclef.py ...`
(/root/reference/run_imageclef.py)."""

from vqa_project_tpu.cli.run_imageclef import main

if __name__ == "__main__":
    main()
