"""Decompose flagship joint-potential grad cost: event vs selection vs tables,
matmul vs gather interp, n_z sensitivity.  Run on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import importlib
interp_mod = importlib.import_module('bumpcosmology_tpu.ops.interp')

PLATFORM = jax.devices()[0].platform
DEFAULT = "matmul" if PLATFORM in ("tpu", "axon") else "gather"

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    _cosmo_frame_logwts,
    cosmo_from_sites,
    pop_cosmo_model_spec,
    population_from_sites,
)
from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample
from bumpcosmology_tpu.models.cosmology import build_cosmology
from bumpcosmology_tpu.models.population import build_population
from bumpcosmology_tpu.ops.logsumexp import logsumexp


def chain_time(f, theta, n=300, label=""):
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
    print(f"{label:48s} {dt * 1e3:8.3f} ms/eval", flush=True)
    return dt


data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = pop_cosmo_model_spec(data)
theta0 = prior_sample(spec, jax.random.PRNGKey(0))
sites0 = constrain(spec, theta0)


def make_term(events=True, selection=True, n_grid=256, n_z=1024):
    def pot(theta):
        sites = constrain(spec, theta)
        pop = build_population(population_from_sites(sites), n_grid)
        cosmo = build_cosmology(cosmo_from_sites(sites), n=n_z)
        out = 0.0
        if events:
            ev = data.events
            lw = _cosmo_frame_logwts(pop, cosmo, ev.a, ev.q, ev.c, ev.log_pdraw)
            out = out + jnp.sum(logsumexp(lw, axis=1))
        if selection:
            sel = data.selection
            lsw = _cosmo_frame_logwts(pop, cosmo, sel.a, sel.q, sel.c, sel.log_pdraw)
            out = out - 56.0 * (logsumexp(lsw) - sel.log_ndraw)
        return out
    return pot


for method in (DEFAULT, "gather"):
    interp_mod.set_default_method(method)
    print(f"--- interp method: {method}")
    chain_time(make_potential(spec), theta0, label="full potential")
    chain_time(make_term(True, True), theta0, label="events+selection (no prior/R)")
    chain_time(make_term(True, False), theta0, label="events only (14336 queries)")
    chain_time(make_term(False, True), theta0, label="selection only (8192 queries)")
    chain_time(make_term(False, True, n_z=256), theta0, label="selection only, n_z=256")
    chain_time(make_term(True, True, n_z=256), theta0, label="events+selection, n_z=256")
interp_mod.set_default_method(DEFAULT)
