#!/usr/bin/env python
"""Repo-root shim preserving `python run_mimic.py ...`
(/root/reference/run_mimic.py)."""

from vqa_project_tpu.cli.run_mimic import main

if __name__ == "__main__":
    main()
