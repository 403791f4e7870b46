"""Profile the joint-potential gradient: where does the per-eval time go?

Times (value+grad, sequential-dependency chains like bench.py) for:
  * the full pop_cosmo potential,
  * the bump-grid table build alone,
  * the cosmology table build alone,
  * the full potential with a cheap stand-in for the bump grid (upper bound
    on what a fused bump kernel could save),
at both the reference (56x128, 1024) and flagship (56x256, 8192) scales.

Usage: python scratch/prof_potential.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

PLATFORM = jax.devices()[0].platform
set_default_method("matmul" if PLATFORM in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import make_potential, prior_sample
from bumpcosmology_tpu.models.cosmology import build_cosmology
from bumpcosmology_tpu.models.mass import build_mass_function
from bumpcosmology_tpu.models.parameters import CosmoParams, DEFAULT_POPULATION
from bumpcosmology_tpu.testing import synthetic_pop_cosmo_data


def chain_time(f, theta, n=200, label=""):
    """Sequential value+grad chain, n iters; returns seconds/eval."""

    @jax.jit
    def chain(t, _n):
        def body(i, carry):
            tt, acc = carry
            u, g = jax.value_and_grad(f)(tt)
            return tt + 1e-7 * jnp.tanh(g), acc + u
        return jax.lax.fori_loop(0, _n, body, (t, 0.0))

    out = chain(theta, 3)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = chain(theta, n)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{label:55s} {dt * 1e3:8.3f} ms/eval   ({1 / dt:8.1f} evals/s)")
    return dt


def profile_scale(name, data):
    print(f"\n=== {name} ===")
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    theta0 = prior_sample(spec, jax.random.PRNGKey(0))
    chain_time(potential, theta0, label="full pop_cosmo potential")

    # bump-grid build alone (scalar in, scalar out through the table)
    mp = DEFAULT_POPULATION.mass

    def bump_only(x):
        params = mp._replace(mpisn=mp.mpisn + 0.0 * x + jnp.tanh(x))
        table = build_mass_function(params)
        return table.log_norm + jnp.sum(table.log_bump * 1e-6)

    chain_time(bump_only, jnp.asarray(0.1), label="bump table build (256^2 fill + log-trapz)")

    def bump_only_128(x):
        params = mp._replace(mpisn=mp.mpisn + jnp.tanh(x))
        table = build_mass_function(params, n_grid=128)
        return table.log_norm + jnp.sum(table.log_bump * 1e-6)

    chain_time(bump_only_128, jnp.asarray(0.1), label="bump table build at n_grid=128")

    def cosmo_only(x):
        c = build_cosmology(
            CosmoParams(
                h=0.7 + 0.01 * jnp.tanh(x), Om=jnp.asarray(0.3), w=jnp.asarray(-1.0)
            )
        )
        return jnp.sum(c.dl * 1e-6)

    chain_time(cosmo_only, jnp.asarray(0.1), label="cosmology table build (1024-pt)")


data_ref = synthetic_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024, seed=0)
profile_scale("reference scale 56x128, 1024 inj", data_ref)

data_flag = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
profile_scale("flagship scale 56x256, 8192 inj", data_flag)
