"""Benchmark: hierarchical-likelihood gradient throughput + short-fit ESS/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: jitted value+grad evaluations/sec of the joint
population+cosmology potential at the reference workload scale (56 events x
128 PE samples, 1024 injections; 256^2 bump grid + 1024-pt cosmology table per
eval — cf. reference ``intensity_models.py:313-406``, SURVEY.md §6).  This is
the NUTS leapfrog hot loop, the direct determinant of ESS/sec.

``vs_baseline``: ratio against the same computation on this host's CPU in
float32 — a proxy for the reference's CPU-only configuration
(``run_fit.py:17`` runs chains on emulated CPU host devices).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _bench_backend(platform: str, n_iters: int) -> float:
    import jax

    devs = jax.devices(platform)
    dev = devs[0]

    # the interp formulation must match the device the arrays live on,
    # not the process-default backend
    from bumpcosmology_tpu.ops.interp import set_default_method

    set_default_method("matmul" if platform in ("tpu", "axon") else "gather")

    import jax.numpy as jnp
    from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_cosmo_data

    data = synthetic_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024, seed=0)
    data = jax.device_put(data, dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    theta0 = jax.device_put(prior_sample(spec, jax.random.PRNGKey(0)), dev)

    @jax.jit
    def chain_of_grads(theta, n):
        # n sequential value+grad evals, each feeding the next position —
        # mimics a leapfrog chain (sequential dependency, no batching tricks)
        def body(i, carry):
            t, acc = carry
            u, g = jax.value_and_grad(potential)(t)
            t2 = t + 1e-6 * jnp.tanh(g)
            return t2, acc + u
        t, acc = jax.lax.fori_loop(0, n, body, (theta, 0.0))
        return t, acc

    # warm up compile
    out = chain_of_grads(theta0, 3)
    jax.block_until_ready(out[0])

    t0 = time.perf_counter()
    out = chain_of_grads(theta0, n_iters)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    return n_iters / dt


def main():
    n_tpu_iters = 300
    n_cpu_iters = 30

    import jax

    platforms = {d.platform for d in jax.devices()}
    accel = None
    for p in ("tpu", "axon"):
        try:
            if jax.devices(p):
                accel = p
                break
        except RuntimeError:
            continue

    if accel is not None:
        value = _bench_backend(accel, n_tpu_iters)
    else:
        value = _bench_backend("cpu", n_cpu_iters)

    try:
        cpu_rate = _bench_backend("cpu", n_cpu_iters)
    except Exception:
        cpu_rate = float("nan")

    vs_baseline = value / cpu_rate if cpu_rate == cpu_rate and cpu_rate > 0 else 1.0
    print(
        json.dumps(
            {
                "metric": "pop_cosmo_grad_evals_per_sec",
                "value": round(float(value), 2),
                "unit": "evals/s",
                "vs_baseline": round(float(vs_baseline), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
