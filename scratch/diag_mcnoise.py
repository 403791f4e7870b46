"""Decisive test: are the pseudo-modes selection-MC artifacts?

1. Measure neff_sel / per-event neff at the MAP (noise scale estimate).
2. Rebuild the same catalog with nsel=8192 (fresh injections, same events)
   and re-run the multi-start probe + the inter-basin path scan.
   If the second basin vanishes / the valley flattens into one basin,
   the MC-noise hypothesis is confirmed.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    pop_cosmo_model_spec,
    pop_cosmo_deterministics,
)
from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample

dm = np.load("/root/repo/scratch/diag_cpu_128_1024.npz")
dg = np.load("/root/repo/scratch/diag_global.npz")
tm = jnp.asarray(dm["theta_map"])
deep = jnp.asarray(dg["finals_theta"][np.argmin(dg["finals_u"])])

print("# --- noise scales at nsel=1024 ---", flush=True)
data1 = mock_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024)
spec1 = pop_cosmo_model_spec(data1)
det = pop_cosmo_deterministics(constrain(spec1, tm), data1)
print(f"neff_sel at MAP: {float(det['neff_sel']):.0f}  -> selection noise ~ "
      f"{56.0/np.sqrt(float(det['neff_sel'])):.2f} nats")
print(f"per-event neff: min {float(np.min(det['neff'])):.0f} "
      f"median {float(np.median(det['neff'])):.0f}")
ev_noise = np.sqrt(np.sum(1.0 / np.asarray(det["neff"])))
print(f"event-sum noise ~ {ev_noise:.2f} nats")

print("\n# --- same catalog, nsel=8192 (needs bigger campaign) ---", flush=True)
data8 = mock_pop_cosmo_data(nobs=56, nsamp=128, nsel=8192, ndraw_campaign=2_400_000)
spec8 = pop_cosmo_model_spec(data8)
pot8 = make_potential(spec8)
U8 = jax.jit(pot8)
det8 = pop_cosmo_deterministics(constrain(spec8, tm), data8)
print(f"neff_sel at MAP (nsel=8192): {float(det8['neff_sel']):.0f} -> noise ~ "
      f"{56.0/np.sqrt(float(det8['neff_sel'])):.2f} nats")

print("\n# --- path scan map->deep under the high-nsel likelihood ---", flush=True)
ts = np.linspace(-0.25, 1.25, 151)
pts = tm[None, :] * (1 - ts)[:, None] + deep[None, :] * ts[:, None]
us8 = np.asarray(jax.vmap(U8)(pts))
us1 = np.asarray(jax.vmap(jax.jit(make_potential(spec1)))(pts))
print("t      U(nsel=1024)   U(nsel=8192)")
for i in range(0, 151, 10):
    print(f"{ts[i]:+.2f}  {us1[i]-us1.min():12.3f}  {us8[i]-us8.min():12.3f}")

print("\n# --- multi-start optimization under nsel=8192 ---", flush=True)
import optax

opt = optax.adam(1e-2)


@jax.jit
def opt_step(theta, state):
    u, g = jax.value_and_grad(pot8)(theta)
    upd, state = opt.update(g, state)
    return optax.apply_updates(theta, upd), state, u


starts = jax.vmap(lambda k: prior_sample(spec8, k))(
    jax.random.split(jax.random.PRNGKey(42), 8)
)
H0 = dm["H"]
for i in range(8):
    th, st = starts[i], opt.init(starts[i])
    for _ in range(1500):
        th, st, u = opt_step(th, st)
    dd = np.asarray(th) - np.asarray(tm)
    print(f"start {i}: U_final={float(u):9.3f} whitened_dist_to_old_map={float(np.sqrt(dd@H0@dd)):6.2f}")
print("done", flush=True)
