"""Score-identity test: if the simulator matches the likelihood exactly,
E_{data|θ}[∇_θ log L̂(data|θ)] = 0 for every θ.  A significant nonzero mean
score localizes the generative↔model mismatch by component — no MCMC needed.

Also splits the score into the event-sum and selection terms to bisect.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.inference.calibration import make_mock_pop_cosmo_simulator_fresh
from bumpcosmology_tpu.inference.likelihoods import (
    POP_COSMO_PRIORS,
    pop_cosmo_loglike,
)
from bumpcosmology_tpu.mock import draw_injection_campaign
from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION, PLANCK18

N_CATALOGS = 200
NOBS, NSAMP, NSEL = 16, 256, 3584

camp = draw_injection_campaign(ndraw=6_500_000, seed=424242, snr_chunk=65536)
sim = make_mock_pop_cosmo_simulator_fresh(
    camp, nobs=NOBS, nsamp=NSAMP, nsel=NSEL, pe_bank_size=16384, threshold=20.0
)

# fiducial θ as the site dict (R_unit irrelevant to the likelihood)
mp, rp = DEFAULT_POPULATION.mass, DEFAULT_POPULATION.redshift
sites0 = {
    "h": PLANCK18.h, "Om": PLANCK18.Om, "w": PLANCK18.w,
    "a": mp.a, "b": mp.b, "c": mp.c, "mpisn": mp.mpisn,
    "dmbhmax": mp.mbhmax - mp.mpisn, "sigma": mp.sigma,
    "log_fpl": float(np.log(mp.fpl)), "beta": mp.beta,
    "lam": rp.lam, "dkappa": rp.kappa - rp.lam, "zp": rp.zp,
    "R_unit": 0.0,
}
sites0 = {k: jnp.asarray(v, jnp.float32) for k, v in sites0.items()}

GRAD_SITES = ("lam", "c", "beta", "h", "zp", "mpisn")


from bumpcosmology_tpu.inference.likelihoods import _pop_cosmo_event_sel_logwts
import math as _math
from jax.scipy.special import logsumexp as _lse


@jax.jit
def score(data):
    def term(vals, which):
        s = dict(sites0)
        for k, v in zip(GRAD_SITES, vals):
            s[k] = v
        _, _, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(s, data, 256, 1024)
        ev = jnp.sum(_lse(log_wts, axis=1) - _math.log(log_wts.shape[1]))
        sel = -float(NOBS) * (_lse(log_sel_wts) - data.selection.log_ndraw)
        return jnp.where(which == 0, ev, sel)

    vals = jnp.stack([sites0[k] for k in GRAD_SITES])
    g_ev = jax.grad(lambda v: term(v, 0))(vals)
    g_sel = jax.grad(lambda v: term(v, 1))(vals)
    return jnp.stack([g_ev, g_sel])


rng = np.random.default_rng(777)
np_sites = {k: np.asarray(v) for k, v in sites0.items()}
scores = []
for i in range(N_CATALOGS):
    data = sim(rng, np_sites)
    scores.append(np.asarray(score(data)))
    if (i + 1) % 100 == 0:
        print(f"[{i+1}]", flush=True)

arr = np.array(scores)  # (N, 2, K)
for t, name in ((0, "EVENT term"), (1, "SELECTION term")):
    m, se = arr[:, t].mean(0), arr[:, t].std(0, ddof=1) / np.sqrt(len(arr))
    print(f"\n{name} mean score:")
    for j, k in enumerate(GRAD_SITES):
        print(f"  {k:7s} {m[j]:+.4f} ± {se[j]:.4f}   z = {m[j]/se[j]:+.1f}")
m, se = arr.sum(1).mean(0), arr.sum(1).std(0, ddof=1) / np.sqrt(len(arr))
print("\nTOTAL:")
for j, k in enumerate(GRAD_SITES):
    print(f"  {k:7s} {m[j]:+.4f} ± {se[j]:.4f}   z = {m[j]/se[j]:+.1f}")
