"""Driver-contract tests for __graft_entry__.py.

The driver invokes these hooks in a FRESH process with NO env preparation
(round-1 failure mode: dryrun_multichip asserted 8 devices instead of
provisioning the virtual CPU mesh itself — MULTICHIP_r01.json ok=false).
These tests reproduce the driver's exact invocation via subprocess so a
regression cannot hide behind tests/conftest.py's own mesh setup.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # Strip the mesh prep conftest.py injected; the hook must self-provision.
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    # Skip the axon-tunnel PJRT registration in the subprocess (the
    # image's sitecustomize dials the relay at interpreter boot when
    # this is set, and wedges forever if the tunnel is down). The dry
    # run under test is virtual-CPU by contract, so the tests must not
    # depend on tunnel health.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.mark.slow  # ~2 min compile-heavy subprocess; the driver also
#                    runs dryrun_multichip every round (MULTICHIP_rN)
def test_dryrun_multichip_self_provisions():
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    # Driver variants may touch jax.devices() first; clear_backends path.
    # Pin the platform to cpu (as the driver does): with it unset, the
    # eager jax.devices() would initialize the axon TPU backend and the
    # test would hang whenever the tunnel is down — an environmental
    # failure, not a contract one. The default 1-device cpu backend still
    # forces dryrun through the clear_backends re-provision path.
    env = _clean_env()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.devices();"
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_entry_compiles():
    # In-process is fine here: entry() is platform-agnostic.
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    logits, adjacency = jax.jit(fn)(*args)
    assert logits.shape == (32, 3001)
    assert adjacency.shape[1] == adjacency.shape[2]


def test_entry_pallas_env(monkeypatch):
    """VQAX_ENTRY_PALLAS lets the driver artifact cover the shipped
    fused-kernel default (VERDICT round 3 item 6): 'force' pins the
    Pallas path on (interpret mode here on CPU) and the forward still
    compiles and runs at flagship dims."""
    import jax

    import __graft_entry__

    monkeypatch.setenv("VQAX_ENTRY_PALLAS", "force")
    fn, args = __graft_entry__.entry()
    logits, _ = jax.jit(fn)(*args)
    assert logits.shape == (32, 3001)
