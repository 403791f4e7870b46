"""Decompose the flagship joint-potential cost on the real chip.

Times value+grad of: (a) the full potential, (b) selection-term only,
(c) event-term only, (d) the per-eval table builds (population grid,
cosmology table, detector table) — at 1/4/16 vectorized thetas.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    _cosmo_frame_logwts_fused,
    _pop_cosmo_event_sel_logwts,
    dl_bounds_of,
    pop_cosmo_model_spec,
    population_from_sites,
    cosmo_from_sites,
)
from bumpcosmology_tpu.inference.model import make_potential
from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv
from bumpcosmology_tpu.models.cosmology import build_cosmology, build_detector_table
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.ops.logsumexp import logsumexp
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP = "/root/repo/benchmarks/flagship_warmup.npz"


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    plat = None
    for p in ("tpu", "axon"):
        try:
            if jax.devices(p):
                plat = p
                break
        except RuntimeError:
            continue
    assert plat, "no accelerator"
    dev = jax.devices(plat)[0]
    set_default_method("matmul")

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm = jax.device_put(load_warmup(WARMUP), dev)
    theta4 = warm.state.theta  # (4, dim)
    dlb = dl_bounds_of(data)
    nz = 1024

    # unconstrained theta -> sites dict (same transform the potential uses)
    from bumpcosmology_tpu.inference.model import constrain

    def sites_of(t):
        return constrain(spec, t)

    ev, sel = data.events, data.selection

    def full(t):
        return potential(t)

    def tables_only(t):
        s = sites_of(t)
        pop = build_population(population_from_sites(s), 256)
        cosmo = build_cosmology(cosmo_from_sites(s), n=nz)
        det = build_detector_table(cosmo, dlb[0], dlb[1], n=nz)
        return (
            jnp.sum(pop.mass_table.log_bump)
            + jnp.sum(cosmo.dl)
            + jnp.sum(det.cols)
        )

    def sel_only(t):
        s = sites_of(t)
        pop = build_population(population_from_sites(s), 256)
        cosmo = build_cosmology(cosmo_from_sites(s), n=nz)
        det = build_detector_table(cosmo, dlb[0], dlb[1], n=nz)
        lw = _cosmo_frame_logwts_fused(pop, det, sel.a, sel.q, sel.c, sel.log_pdraw)
        return logsumexp(lw)

    def ev_only(t):
        s = sites_of(t)
        pop = build_population(population_from_sites(s), 256)
        cosmo = build_cosmology(cosmo_from_sites(s), n=nz)
        det = build_detector_table(cosmo, dlb[0], dlb[1], n=nz)
        lw = _cosmo_frame_logwts_fused(pop, det, ev.a, ev.q, ev.c, ev.log_pdraw)
        return jnp.sum(logsumexp(lw, axis=1))

    for name, fn in (
        ("full_potential", full),
        ("tables_only", tables_only),
        ("sel_term", sel_only),
        ("event_term", ev_only),
    ):
        g1 = jax.jit(jax.value_and_grad(fn))
        gv = jax.jit(jax.vmap(jax.value_and_grad(fn)))
        t1 = timeit(g1, theta4[0])
        t4 = timeit(gv, theta4)
        theta16 = jnp.tile(theta4, (4, 1))
        t16 = timeit(gv, theta16)
        print(f"{name:16s} vg 1theta {t1:7.3f} ms | 4theta {t4:7.3f} | 16theta {t16:7.3f}")

    # forward-only full potential for reference
    f1 = jax.jit(full)
    print(f"{'full fwd only':16s} 1theta {timeit(f1, theta4[0]):7.3f} ms")


if __name__ == "__main__":
    main()
