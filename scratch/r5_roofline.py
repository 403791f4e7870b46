"""Roofline the flagship joint potential on the real chip (round-5 item 1).

Measures, at the bench configuration (64 vmapped chains, value+grad):
  * wall time per vmapped eval and per theta;
  * XLA's own cost model (flops, bytes accessed) via compiled.cost_analysis()
    -> achieved FLOP/s and HBM GB/s vs chip peak;
  * term ablations (events / selection / bump build / table builds) at width 64;
  * n_z (detector-table resolution) sensitivity;
  * the chip's default f32 matmul precision (effective mantissa bits), since
    every interp lookup is a matmul against log-density tables.

Usage: python scratch/r5_roofline.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PLATFORM = jax.devices()[0].platform
print(f"platform: {PLATFORM}, device: {jax.devices()[0]}")

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method(None if PLATFORM in ("tpu", "axon") else "gather")
if PLATFORM == "axon":
    # axon reports platform 'axon'; interp's backend default keys off 'tpu'.
    set_default_method("tiled")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    _cosmo_frame_logwts_fused,
    build_detector_table,
    cosmo_from_sites,
    dl_bounds_of,
    pop_cosmo_model_spec,
    population_from_sites,
)
from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample
from bumpcosmology_tpu.models.cosmology import build_cosmology, z_and_logjac_at_dl
from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv
from bumpcosmology_tpu.ops.logsumexp import logsumexp

WIDTH = 64

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
ev, sel = data.events, data.selection
print(f"events {ev.a.shape}, selection {sel.a.shape}")
spec = pop_cosmo_model_spec(data)
bounds = dl_bounds_of(data)

key = jax.random.PRNGKey(0)
theta1 = prior_sample(spec, key)
ndim = theta1.shape[0]
thetaW = jax.vmap(lambda k: prior_sample(spec, k))(jax.random.split(key, WIDTH))


def timed_vg(f, theta, n=60, label="", width=None):
    """Time value+grad as a sequential dependency chain (no pipelining)."""
    vg = jax.value_and_grad(f)
    if width is not None:
        vg_inner = vg
        vg = lambda t: jax.tree.map(
            lambda x: x, jax.vmap(vg_inner)(t)
        )

    @jax.jit
    def chain(t, _n):
        def body(i, carry):
            tt, acc = carry
            u, g = vg(tt)
            return tt + 1e-7 * jnp.tanh(g), acc + jnp.sum(u)

        return jax.lax.fori_loop(0, _n, body, (t, 0.0))

    out = chain(theta, 2)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = chain(theta, n)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / n
    w = width or 1
    print(f"{label:58s} {dt*1e3:8.3f} ms/eval  ({dt/w*1e6:7.1f} us/theta)", flush=True)
    return dt


def cost_of(f, theta, width=None):
    """XLA cost analysis of one vmapped value+grad call."""
    vg = jax.value_and_grad(f)
    if width is not None:
        vg = jax.vmap(vg)
    comp = jax.jit(vg).lower(theta).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca


# ---------------------------------------------------------------- precision probe
rng = np.random.default_rng(0)
A = rng.standard_normal((256, 256)).astype(np.float32)
B = rng.standard_normal((256, 256)).astype(np.float32)
ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
got = np.asarray(jax.jit(jnp.dot)(jnp.asarray(A), jnp.asarray(B)))
rel = np.abs(got - ref) / (np.abs(ref) + 1e-30)
bits = -np.log2(np.median(rel) + 1e-30)
print(f"\nf32 matmul default precision: median rel err {np.median(rel):.2e} (~{bits:.1f} mantissa bits)")
for prec in ("default", "float32", "highest"):
    got = np.asarray(
        jax.jit(lambda a, b: jnp.dot(a, b, precision=prec))(jnp.asarray(A), jnp.asarray(B))
    )
    rel = np.median(np.abs(got - ref) / (np.abs(ref) + 1e-30))
    print(f"  precision={prec:8s}: median rel err {rel:.2e} (~{-np.log2(rel+1e-30):.1f} bits)")

# ---------------------------------------------------------------- headline timing
print("\n=== full potential, width 1 and 64 (value+grad) ===")
pot = make_potential(spec)
t1 = timed_vg(pot, theta1, n=120, label="full potential, width 1")
tW = timed_vg(pot, thetaW, n=40, label=f"full potential, width {WIDTH}", width=WIDTH)

ca = cost_of(pot, thetaW, width=WIDTH)
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"XLA cost model (width {WIDTH} value+grad): {flops/1e9:.2f} GFLOP, {bytes_/1e6:.1f} MB accessed")
print(f"  achieved: {flops/tW/1e12:.3f} TFLOP/s, {bytes_/tW/1e9:.1f} GB/s")
print("  v5e peaks: ~197 TFLOP/s bf16 / ~49 TFLOP/s f32(3-pass) ; HBM ~819 GB/s")

# ---------------------------------------------------------------- term ablation
print("\n=== term ablation, width 64 (value+grad) ===")


def make_pot(events=True, selection=True, mass_lookup=True, zfetch=True, n_z=1024):
    def pot(theta):
        sites = constrain(spec, theta)
        pop = build_population(population_from_sites(sites), 256)
        cosmo = build_cosmology(cosmo_from_sites(sites), n=1024)
        det = build_detector_table(cosmo, bounds[0], bounds[1], n=n_z)

        def logwts(a, q, dl, log_pdraw):
            if zfetch:
                z, log_jac = z_and_logjac_at_dl(det, dl)
            else:
                z = 0.1 * jnp.log1p(dl)
                log_jac = jnp.zeros_like(dl)
            m1 = a / (1.0 + z)
            if mass_lookup:
                core = log_dndmdqdv(pop, m1, q, z)
            else:
                core = -0.5 * m1 - q + jnp.sum(pop.mass_table.log_bump) * 0.0 + z
            return core - 2.0 * jnp.log1p(z) + log_jac - log_pdraw

        out = 0.0
        if events:
            lw = logwts(ev.a, ev.q, ev.c, ev.log_pdraw)
            out = out + jnp.sum(logsumexp(lw, axis=1))
        if selection:
            lsw = logwts(sel.a, sel.q, sel.c, sel.log_pdraw)
            out = out - ev.a.shape[0] * (logsumexp(lsw) - sel.log_ndraw)
        return out

    return pot


timed_vg(make_pot(), thetaW, n=40, label="ev+sel (tables+lookups, no prior)", width=WIDTH)
timed_vg(make_pot(selection=False), thetaW, n=40, label="events only", width=WIDTH)
timed_vg(make_pot(events=False), thetaW, n=40, label="selection only", width=WIDTH)
timed_vg(make_pot(zfetch=False), thetaW, n=40, label="ev+sel, z-fetch replaced (analytic stub)", width=WIDTH)
timed_vg(make_pot(mass_lookup=False), thetaW, n=40, label="ev+sel, mass lookup replaced (stub)", width=WIDTH)
timed_vg(
    make_pot(zfetch=False, mass_lookup=False),
    thetaW,
    n=40,
    label="ev+sel, both lookups stubbed (builds+elemwise)",
    width=WIDTH,
)
for nz in (512, 256):
    timed_vg(make_pot(n_z=nz), thetaW, n=40, label=f"ev+sel, detector table n_z={nz}", width=WIDTH)

# table builds alone
def builds_only(theta):
    sites = constrain(spec, theta)
    pop = build_population(population_from_sites(sites), 256)
    cosmo = build_cosmology(cosmo_from_sites(sites), n=1024)
    det = build_detector_table(cosmo, bounds[0], bounds[1], n=1024)
    return (
        jnp.sum(pop.mass_table.log_bump)
        + jnp.sum(det.cols)
        + jnp.sum(cosmo.dc)
    )


timed_vg(builds_only, thetaW, n=40, label="table builds only (bump+cosmo+det)", width=WIDTH)


def bump_only(theta):
    sites = constrain(spec, theta)
    pop = build_population(population_from_sites(sites), 256)
    return jnp.sum(pop.mass_table.log_bump)


timed_vg(bump_only, thetaW, n=40, label="bump grid build only", width=WIDTH)
print("done")
