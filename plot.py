#!/usr/bin/env python
"""Repo-root shim preserving `python plot.py ...`
(/root/reference/plot.py)."""

from vqa_project_tpu.cli.plot import main

if __name__ == "__main__":
    main()
