"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Multi-chip sharding is validated on host platform devices
(xla_force_host_platform_device_count), the TPU-parity analog of the
reference's CPU-only CI (reference .github/workflows/test.yml:17).
"""

import os

# Must run before any jax import anywhere in the test session.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices("cpu")
