"""Global geometry probe: multimodality + curvature variation across the posterior.

1. Multi-start MAP optimization from prior draws — do optimizers land at the
   same point/energy? (multimodality test)
2. Local Hessian eigen-spread at points dispersed like the posterior
   (N(MAP, H^-1) draws) — does stiffness vary with position? (funnel test)
3. Posterior correlation structure from H^-1 (informs reparameterization).
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import make_potential, prior_sample, unconstrain

data = mock_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024)
spec = pop_cosmo_model_spec(data)
potential = make_potential(spec)
names = list(spec.names)

d = np.load("/root/repo/scratch/diag_cpu_128_1024.npz")
theta_map = jnp.asarray(d["theta_map"])
H0 = d["H"]
evals0 = d["evals"]

import optax

opt = optax.adam(1e-2)


@jax.jit
def opt_step(theta, state):
    u, g = jax.value_and_grad(potential)(theta)
    updates, state = opt.update(g, state)
    return optax.apply_updates(theta, updates), state, u


def optimize(theta, n=1500):
    state = opt.init(theta)
    u = np.inf
    for i in range(n):
        theta, state, u = opt_step(theta, state)
    return theta, float(u)


print("# --- multi-start optimization (8 prior inits) ---", flush=True)
key = jax.random.PRNGKey(42)
starts = jax.vmap(lambda k: prior_sample(spec, k))(jax.random.split(key, 8))
finals = []
for i in range(8):
    th, u = optimize(starts[i])
    finals.append((np.asarray(th), u))
    # distance to reference MAP in whitened units
    dd = np.asarray(th) - np.asarray(theta_map)
    w = float(np.sqrt(dd @ H0 @ dd))
    print(f"start {i}: U_final={u:9.3f}  whitened_dist_to_map={w:8.2f}", flush=True)

us = np.array([u for _, u in finals])
print("# U_final spread:", us.min(), us.max())

print("\n# --- Hessian spread across posterior-typical points ---", flush=True)
cov = np.linalg.inv(H0)
L = np.linalg.cholesky(cov)
hess_fn = jax.jit(jax.jacfwd(jax.grad(potential)))
rng = np.random.default_rng(0)
# correlate local stiffness with position
recs = []
for i in range(12):
    x = np.asarray(theta_map) + L @ rng.standard_normal(len(names)) * (1.0 if i < 8 else 2.0)
    Hx = np.asarray(hess_fn(jnp.asarray(x)), np.float64)
    ev = np.linalg.eigvalsh(Hx)
    # whitened-by-MAP-covariance curvature: eig of L^T Hx L
    evw = np.linalg.eigvalsh(L.T @ Hx @ L)
    recs.append((x, ev, evw))
    print(
        f"pt {i} (r={'1' if i < 8 else '2'}sigma): raw_eig[min,max]=[{ev[0]:9.3g},{ev[-1]:9.3g}] "
        f"whitened_eig[min,max]=[{evw[0]:9.3g},{evw[-1]:9.3g}]",
        flush=True,
    )

print("\n# --- posterior correlations (from H^-1 at MAP) ---")
sd = np.sqrt(np.diag(cov))
corr = cov / np.outer(sd, sd)
for i in range(len(names)):
    for j in range(i):
        if abs(corr[i, j]) > 0.6:
            print(f"corr({names[i]},{names[j]}) = {corr[i,j]:+.3f}")

np.savez("/root/repo/scratch/diag_global.npz",
         finals_theta=np.stack([t for t, _ in finals]),
         finals_u=us, corr=corr)
print("done", flush=True)
