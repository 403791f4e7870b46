"""How good is the committed warmup mass vs the golden f64 posterior cov?

If M ~ C_gold the whitened target should be ~N(0,I) and the measured
T=10.9 reflects real nonlinearity; if not, better mass is free speed.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import unconstrain
from bumpcosmology_tpu.utils.checkpoint import load_warmup

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = pop_cosmo_model_spec(data)
warm = load_warmup("/root/repo/benchmarks/flagship_warmup.npz")

d = np.load("/root/repo/benchmarks/golden_joint_f64.npz", allow_pickle=True)
names = [k[5:] for k in d.files if k.startswith("post_")]
flat = {n: jnp.asarray(d["post_" + n].reshape(-1), jnp.float64) for n in names}
n = flat[names[0]].shape[0]
th = jax.vmap(lambda i: unconstrain(spec, {k: v[i] for k, v in flat.items()}))(jnp.arange(n))
th = np.asarray(th, np.float64)
C = np.cov(th.T)

cov = np.asarray(warm.cov, np.float64)  # (chains, dim, dim) presumably
print("warm.cov shape", cov.shape, "eps", np.asarray(warm.eps))
for c in range(cov.shape[0]):
    M = cov[c]
    Lm = np.linalg.cholesky(M)
    W = np.linalg.solve(Lm, np.linalg.solve(Lm, C).T).T  # Lm^-1 C Lm^-T
    ev = np.linalg.eigvalsh(W)
    print(f"chain {c}: whitened-target eigenvalues {np.sort(ev).round(3)} cond={ev.max()/ev.min():.1f}")
Lg = np.linalg.cholesky(C)
Wg = np.linalg.solve(Lg, np.linalg.solve(Lg, C).T).T
print("sanity golden-vs-golden cond:", np.linalg.cond(Wg))
# nonlinearity probe: third/fourth joint moments of golden-whitened draws
w = np.linalg.solve(Lg, (th - th.mean(0)).T).T
print("whitened skew max |E[w_i w_j^2]|:",
      np.abs(np.einsum('ni,nj->ij', w, w**2) / len(w)).max())
k4 = np.einsum('ni,nj->ij', w**2, w**2) / len(w) - 1 - 2 * (w.T @ w / len(w))**2
print("max |excess cross-kurtosis|:", np.abs(k4).max())
