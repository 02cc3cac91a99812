"""Test configuration: route jax compute to an 8-device virtual CPU mesh.

This container pre-imports jax with the TPU ('axon') backend via
sitecustomize, so JAX_PLATFORMS cannot be overridden here. Instead the CPU
backend (lazily initialized) is forced to expose 8 virtual devices and made
the default device, which keeps unit tests fast (no 20-40s TPU compiles) and
lets multi-chip sharding be validated on a CPU mesh — the analog of the
reference's CPU-only CI (reference .github/workflows/test.yml:17).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
