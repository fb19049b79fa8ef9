"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; JAX's standard fake-backend trick
(xla_force_host_platform_device_count) lets sharding/collective code paths be
exercised on CPU (SURVEY §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + speed for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Force CPU even when the environment presets JAX_PLATFORMS (e.g. 'axon');
# the env var alone is overridden by the TPU plugin, so set the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
