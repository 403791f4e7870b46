"""Round-2 geometry diagnosis for the joint pop+cosmo posterior.

Questions this script answers (on the benchmark mock catalog):
  1. Is the potential *rough* (MC-noise jaggedness from finite PE/injection
     samples) or *smoothly stiff* (curvature/funnel) at the eps~3e-4 scale
     NUTS adapts to?
  2. Which directions are stiff: coordinate axes, Hessian eigenvectors?
  3. Does the stiffness scale with nsamp/nsel (MC noise shrinks as 1/sqrt(N))?

Run on CPU f64 (slow, exact) or TPU f32.
"""
import os
import sys

PLATFORM = os.environ.get("DIAG_PLATFORM", "cpu")
import jax

if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import make_potential, unconstrain
from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION, PLANCK18

NSAMP = int(os.environ.get("DIAG_NSAMP", "128"))
NSEL = int(os.environ.get("DIAG_NSEL", "1024"))

print(f"# platform={PLATFORM} x64={PLATFORM=='cpu'} nsamp={NSAMP} nsel={NSEL}", flush=True)

data = mock_pop_cosmo_data(nobs=56, nsamp=NSAMP, nsel=NSEL)
spec = pop_cosmo_model_spec(data)
potential = make_potential(spec)
names = list(spec.names)
print("# sites:", names, flush=True)

p = DEFAULT_POPULATION
truth = {
    "h": PLANCK18.h, "Om": PLANCK18.Om, "w": PLANCK18.w,
    "a": p.mass.a, "b": p.mass.b, "c": p.mass.c, "mpisn": p.mass.mpisn,
    "dmbhmax": p.mass.mbhmax - p.mass.mpisn, "sigma": p.mass.sigma,
    "log_fpl": float(np.log(p.mass.fpl)), "beta": p.mass.beta,
    "lam": p.redshift.lam, "dkappa": p.redshift.kappa - p.redshift.lam,
    "zp": p.redshift.zp, "R_unit": 0.0,
}
theta_t = unconstrain(spec, {k: jnp.asarray(float(v)) for k, v in truth.items()})
dtype = jnp.float64 if PLATFORM == "cpu" else jnp.float32
theta_t = theta_t.astype(dtype)

U = jax.jit(potential)
gradU = jax.jit(jax.grad(potential))
print("U(truth) =", float(U(theta_t)), flush=True)

# --- crude MAP refinement with optax adam (keeps us near the mode) ---------
import optax

opt = optax.adam(1e-2)


@jax.jit
def opt_step(theta, state):
    u, g = jax.value_and_grad(potential)(theta)
    updates, state = opt.update(g, state)
    return optax.apply_updates(theta, updates), state, u


theta = theta_t
state = opt.init(theta)
for i in range(600):
    theta, state, u = opt_step(theta, state)
print("U(MAP~) =", float(u), flush=True)
theta_map = theta

# --- Hessian eigenstructure at the mode -------------------------------------
H = jax.jacfwd(jax.grad(potential))(theta_map)
H = np.asarray(H, dtype=np.float64)
evals, evecs = np.linalg.eigh(H)
print("\n# Hessian eigenvalues (ascending):")
print(np.array2string(evals, precision=3))
print("# condition number:", evals[-1] / np.maximum(evals[0], 1e-300))
for tag, idx in (("stiffest", -1), ("second", -2), ("softest", 0)):
    v = evecs[:, idx]
    order = np.argsort(-np.abs(v))[:5]
    comp = ", ".join(f"{names[j]}:{v[j]:+.2f}" for j in order)
    print(f"# {tag} eigvec (lam={evals[idx]:.3g}): {comp}")

# --- 1-D slice roughness scan ------------------------------------------------
# Whiten with the Hessian: dir_i = evecs[:,i]/sqrt(evals[i]) has unit local
# curvature. NUTS-adapted eps ~ 3e-4 means trouble at |t| ~ 1e-3 in these
# units if curvature were the whole story.
def scan_dir(v, scale, n=401, width=4.0):
    ts = np.linspace(-width, width, n) * scale
    pts = theta_map[None, :] + jnp.asarray(ts)[:, None] * jnp.asarray(v, dtype)[None, :]
    us = jax.vmap(U)(pts)
    return ts, np.asarray(us, np.float64)


def roughness(ts, us):
    """Excess second-difference power vs a smooth quartic fit."""
    coef = np.polyfit(ts, us, 4)
    resid = us - np.polyval(coef, ts)
    d2 = np.diff(us, 2)
    return float(np.std(resid)), float(np.median(np.abs(d2)))


print("\n# slice scans (whitened Hessian eigendirections)")
for idx in (-1, -2, -3, len(evals) // 2, 1, 0):
    lam = evals[idx]
    if lam <= 0:
        print(f"# dir {idx}: NEGATIVE curvature {lam:.3g} — skipping whiten")
        continue
    v = evecs[:, idx] / np.sqrt(lam)
    for scale in (1.0, 0.1, 0.01):
        ts, us = scan_dir(v, scale)
        r_resid, r_d2 = roughness(ts, us)
        span = us.max() - us.min()
        print(
            f"dir[{idx:+d}] lam={lam:.3g} scale={scale:5.2f}: dU_span={span:10.4f} "
            f"resid_rms={r_resid:.3e} med|d2U|={r_d2:.3e}"
        )

# --- coordinate-axis scans for the cosmology block ---------------------------
print("\n# coordinate-axis scans (unconstrained units)")
for nm in ("h", "Om", "w", "mpisn", "sigma"):
    i = names.index(nm)
    v = np.zeros(len(names))
    v[i] = 1.0
    for scale in (0.3, 0.03):
        ts, us = scan_dir(v, scale)
        r_resid, r_d2 = roughness(ts, us)
        span = us.max() - us.min()
        print(
            f"{nm:8s} scale={scale:5.2f}: dU_span={span:10.4f} "
            f"resid_rms={r_resid:.3e} med|d2U|={r_d2:.3e}"
        )

np.savez(
    f"/root/repo/scratch/diag_{PLATFORM}_{NSAMP}_{NSEL}.npz",
    theta_map=np.asarray(theta_map), H=H, evals=evals, evecs=evecs,
)
print("\n# saved scratch/diag npz", flush=True)
