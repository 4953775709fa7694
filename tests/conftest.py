"""Test configuration: force JAX onto CPU with 8 virtual devices.

Multi-chip sharding paths are exercised via XLA host-device simulation
(``--xla_force_host_platform_device_count=8``) so the suite runs anywhere.

The surrounding environment may preload jax bound to a TPU platform (sitecustomize)
— there fp32 matmuls run at reduced precision and per-shape compiles are slow — so
unit tests force the CPU backend via ``jax.config`` (env vars alone are read too
early to help).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
