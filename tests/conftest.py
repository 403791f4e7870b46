"""Test configuration: 8 virtual CPU devices, as the TPU-mesh stand-in.

Mirrors the reference's ``numpyro.set_host_device_count(8)``
(``src/scripts/run_fit.py:17``): sharding tests assert single-device ==
multi-device numerics on a CPU-backed virtual mesh.

Note: the session's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"`` at interpreter start, so plain env vars are not
enough — we override the config after import, before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual CPU devices, got {devs}"
    return devs
