"""Test configuration: CPU suite by default, real-chip tier with MIMIC_TPU_TESTS=1.

Default (CPU CI): force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths are exercised via XLA host-device simulation
(``--xla_force_host_platform_device_count=8``) and the suite runs anywhere.
Tests marked ``@pytest.mark.tpu`` are deselected (they exercise compiled Mosaic
kernels that interpret-mode cannot cover).

On-TPU tier: ``MIMIC_TPU_TESTS=1 PYTHONPATH=$PWD:/root/.axon_site
JAX_PLATFORMS=axon python -m pytest tests/ -m tpu -q`` leaves the platform
alone (the real chip) and runs only the ``tpu``-marked subset.  The axon tunnel
serializes one on-chip client — never run this concurrently with another
on-chip process.

The surrounding environment may preload jax bound to a TPU platform
(sitecustomize) — there fp32 matmuls run at reduced precision and per-shape
compiles are slow — so the CPU mode forces the backend via ``jax.config``
(env vars alone are read too early to help).
"""

import os

TPU_TIER = os.environ.get("MIMIC_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if config.option.markexpr:
        return  # explicit -m wins
    if TPU_TIER:
        skip = pytest.mark.skip(reason="TPU tier runs only @pytest.mark.tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="requires the real TPU chip (MIMIC_TPU_TESTS=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return devices
