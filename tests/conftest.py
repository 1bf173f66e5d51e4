"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to test multi-chip sharding without hardware
(SURVEY.md section 4): XLA_FLAGS=--xla_force_host_platform_device_count=8.
Must be set before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Cheap CPU compiles: tests verify math, not codegen quality.
flags += " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# Belt and braces: if jax was imported before this conftest (pytest plugins),
# the env var alone is ignored — force the platform through the config too.
# This must run before any backend-initializing jax call.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
