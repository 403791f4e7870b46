"""Eval cost vs interp method override on the flagship joint potential.

After the round-3 override-semantics fix, an explicit
set_default_method("matmul") is honored literally — bypassing the tiled
two-level path that is the TPU default.  bench.py and the r3 experiment
scripts all force "matmul"; measure what that costs.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import make_potential
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
K = 50


def scan_eval_time(potential, theta, n=4):
    vg = jax.vmap(jax.value_and_grad(potential))

    @jax.jit
    def many(t):
        def body(c, _):
            v, g = vg(c)
            return c + 1e-12 * g, jnp.sum(v)

        c, vs = jax.lax.scan(body, t, None, length=K)
        return jnp.sum(vs)

    jax.block_until_ready(many(theta))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(many(theta))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    dev = jax.devices()[0]
    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    warm16 = load_warmup(WARMUP16)
    theta = jax.device_put(jnp.asarray(np.asarray(warm16.state.theta)), dev)

    for override in ("matmul", None, "tiled"):
        set_default_method(override)
        spec = pop_cosmo_model_spec(data)
        potential = make_potential(spec)
        dt = scan_eval_time(potential, theta)
        v = jax.vmap(potential)(theta)
        print(
            f"[method={override!s:7s}] {dt * 1e3:7.3f} ms/eval (16 thetas)  "
            f"potential[0]={float(v[0]):.6f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
