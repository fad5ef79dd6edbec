"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives
without TPU hardware (SURVEY.md section 4). Must run before jax imports.
"""

import os

# Force-set: the environment pins JAX_PLATFORMS=axon (the TPU tunnel), so
# setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
