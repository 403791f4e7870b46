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
    # (1-core machine shared with a TPU-driver process) XLA:CPU compilation
    # segfaults nondeterministically inside backend_compile_and_load —
    # four flaky suite crashes, all with that stack, NONE reproducible in a
    # quiet window (scratch/r4_fast_suite{3,4,5}.log, r4_suite_partB.log;
    # every per-file rerun passed).  This flag removes the parallel-codegen
    # slice of that surface (one contended 34-min rerun passed with it,
    # scratch/r4_codegen_probe.log) but does NOT eliminate the crash —
    # r4_fast_suite5 crashed with the flag set, so the fault is deeper in
    # XLA:CPU compile under oversubscription (environment bug, not a suite
    # bug).  Kept because serial codegen costs nothing on 1-core hosts.
    # If a CI run dies with SIGSEGV in backend_compile_and_load, rerun in a
    # quiet window before suspecting the code.
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
