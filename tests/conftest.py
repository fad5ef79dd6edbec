"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives
without TPU hardware (SURVEY.md section 4). Must run before jax imports.
"""

import os

# VQAX_TEST_TPU=1 leaves the real TPU platform in place for the
# on-chip-only tests (test_dropout_onchip.py — the in-kernel TPU PRNG
# cannot lower in interpret mode); run those files alone in that mode,
# the rest of the suite assumes the 8-device CPU mesh.
_USE_TPU = os.environ.get("VQAX_TEST_TPU") == "1"

# The image's sitecustomize.py imports jax at interpreter start (to
# register the axon TPU plugin), so environment variables alone are read
# too late — jax.config.update is required to switch the platform. The
# XLA_FLAGS are still honored because the CPU backend has not been
# initialized yet at conftest time.
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1000)
