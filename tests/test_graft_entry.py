"""Driver-entry regression tests.

Round-1 post-mortem (VERDICT.md "What's weak" #1): the driver calls
``dryrun_multichip(8)`` from a process whose JAX is already initialized
against ONE device, and the round's multi-chip artifact went red because
the function assumed the caller had pre-forced a multi-device platform.
This test reproduces that exact calling shape — a parent with JAX pinned
to a single device — and asserts the self-bootstrapping subprocess path
delivers a green run.
"""

import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PARENT_SCRIPT = """
import os, sys
# Simulate the driver: JAX initialized FIRST, with only one device visible.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 1, "parent must look single-device"
sys.path.insert(0, {repo!r})
import __graft_entry__
__graft_entry__.dryrun_multichip(4)
print("PARENT_OK")
"""


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_single_device_parent():
    proc = subprocess.run(
        [sys.executable, "-c", _PARENT_SCRIPT.format(repo=REPO_ROOT)],
        capture_output=True, text=True, timeout=1200, cwd=REPO_ROOT,
        env={**os.environ, "_EMBEDDINGNET_DRYRUN_CHILD": ""},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PARENT_OK" in proc.stdout
    assert "dryrun_multichip(4): step ok" in proc.stdout


@pytest.mark.slow  # 40-140s compile on the quick-loop box; full suite only
def test_dryrun_multichip_inline_on_virtual_mesh():
    """Under the test conftest (8 CPU devices) the inline path is taken."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(4)
