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
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # Serialize XLA:CPU LLVM codegen.  Under heavy host oversubscription
    # (1-core machine shared with a TPU-driver process) the parallel codegen
    # path segfaulted nondeterministically inside backend_compile_and_load —
    # three flaky suite crashes, all with this stack, none reproducible
    # solo (scratch/r4_fast_suite{3,4}.log, r4_suite_partB.log); a
    # 34-minute contended rerun with the split serialized passed
    # (scratch/r4_codegen_probe.log).  On the 1-core hosts these tests run
    # on, parallel codegen buys nothing anyway.
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

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
