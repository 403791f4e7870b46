"""Per-eval cost via in-program scan (avoids tunnel round-trip noise)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    _cosmo_frame_logwts_fused,
    dl_bounds_of,
    pop_cosmo_model_spec,
    population_from_sites,
    cosmo_from_sites,
)
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.models.population import build_population
from bumpcosmology_tpu.models.cosmology import build_cosmology, build_detector_table
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.ops.logsumexp import logsumexp
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP = "/root/repo/benchmarks/flagship_warmup.npz"
K = 100  # evals per program


def scan_time(fn, theta, n=3):
    """Wall per eval: scan K value_and_grad evals inside one program."""
    vg = jax.value_and_grad(fn)
    if theta.ndim == 2:
        vg = jax.vmap(vg)

    @jax.jit
    def many(t):
        def body(c, _):
            v, g = vg(c)
            # perturb so XLA cannot hoist the eval out of the scan
            return c + 1e-12 * g, jnp.sum(v)
        c, vs = jax.lax.scan(body, t, None, length=K)
        return jnp.sum(vs)

    out = many(theta)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = many(theta)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def main():
    plat = None
    for p in ("tpu", "axon"):
        try:
            if jax.devices(p):
                plat = p
                break
        except RuntimeError:
            continue
    assert plat
    dev = jax.devices(plat)[0]
    set_default_method("matmul")

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm = jax.device_put(load_warmup(WARMUP), dev)
    theta4 = warm.state.theta
    dlb = dl_bounds_of(data)
    nz = 1024
    ev, sel = data.events, data.selection

    def sites_of(t):
        return constrain(spec, t)

    def tables_only(t):
        s = sites_of(t)
        pop = build_population(population_from_sites(s), 256)
        cosmo = build_cosmology(cosmo_from_sites(s), n=nz)
        det = build_detector_table(cosmo, dlb[0], dlb[1], n=nz)
        return jnp.sum(pop.mass_table.log_bump) + jnp.sum(cosmo.dl) + jnp.sum(det.cols)

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
        ("full_potential", potential),
        ("tables_only", tables_only),
        ("sel_term", sel_only),
        ("event_term", ev_only),
    ):
        row = [f"{name:16s}"]
        for nt in (1, 4, 16, 64):
            theta = theta4[0] if nt == 1 else jnp.tile(theta4, (nt // 4, 1))
            row.append(f"{nt:3d}th {scan_time(fn, theta):7.3f}ms")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
