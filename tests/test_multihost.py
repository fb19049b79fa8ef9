"""Multi-host (multi-process) training over gloo CPU collectives.

Runs scripts/demo_multihost_cpu.sh: 2 processes x 4 virtual devices, one
global 8-device data-parallel mesh via jax.distributed.initialize,
per-process batch slices through put_global_batch, distributed Orbax
checkpointing, and the process-0-gathered PNG/FID logging paths.
"""

import os
import random
import subprocess
import sys

import pytest


def test_two_process_training():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PORT"] = str(random.randint(20000, 40000))
    # The child processes must not inherit this process's single-platform
    # lock-in; the worker sets its own platform/device flags.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        ["bash", os.path.join(root, "scripts", "demo_multihost_cpu.sh")],
        env=env, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "MULTIHOST_OK processes=2 devices=8" in out.stdout
    if sys.platform != "linux":  # pragma: no cover
        pytest.skip("gloo demo validated on linux only")
