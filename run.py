#!/usr/bin/env python
"""Repo-root shim preserving the reference's `python run.py ...` surface
(/root/reference/run.py). See vqa_project_tpu/cli/run.py."""

from vqa_project_tpu.cli.run import main

if __name__ == "__main__":
    main()
