"""Two-arm score-identity test: E_{data|theta0}[grad log L-hat] per component,
with the fresh-noise simulator's snr_channel OFF (round-2 baseline) vs ON
(round-3 fix).  A significant nonzero mean score = generative/model mismatch;
the fix should drive the lam/c/beta event-term scores to zero.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.inference.calibration import make_mock_pop_cosmo_simulator_fresh
from bumpcosmology_tpu.inference.likelihoods import _pop_cosmo_event_sel_logwts
from bumpcosmology_tpu.mock import draw_injection_campaign
from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION, PLANCK18
import math as _math
from jax.scipy.special import logsumexp as _lse

N_CATALOGS = 200
NOBS, NSAMP, NSEL = 16, 256, 3584

t0 = time.time()
import os
import pandas as pd
CAMP_CACHE = "/root/repo/scratch/score_campaign.npz"
_COLS = ["m1", "q", "z", "pdraw_mqz", "SNR"]
if os.path.exists(CAMP_CACHE):
    with np.load(CAMP_CACHE) as d:
        camp = pd.DataFrame({k: d[k] for k in _COLS})
    print(f"campaign loaded from cache ({len(camp)})", flush=True)
else:
    camp = draw_injection_campaign(ndraw=6_500_000, seed=424242, snr_chunk=65536)
    np.savez(CAMP_CACHE, **{k: camp[k].to_numpy() for k in _COLS})
print(f"campaign drawn in {time.time()-t0:.0f}s", flush=True)

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

np_sites = {k: np.asarray(v) for k, v in sites0.items()}
for channel in (False, True):
    sim = make_mock_pop_cosmo_simulator_fresh(
        camp, nobs=NOBS, nsamp=NSAMP, nsel=NSEL, pe_bank_size=16384,
        threshold=20.0, snr_channel=channel,
    )
    rng = np.random.default_rng(777)
    scores = []
    t0 = time.time()
    for i in range(N_CATALOGS):
        data = sim(rng, np_sites)
        scores.append(np.asarray(score(data)))
        if (i + 1) % 50 == 0:
            print(f"[channel={channel}] {i+1}/{N_CATALOGS} ({time.time()-t0:.0f}s)", flush=True)
    arr = np.array(scores)
    print(f"\n===== snr_channel={channel} =====")
    for t, name in ((0, "EVENT term"), (1, "SELECTION term")):
        m, se = arr[:, t].mean(0), arr[:, t].std(0, ddof=1) / np.sqrt(len(arr))
        print(f"{name} mean score:")
        for j, k in enumerate(GRAD_SITES):
            print(f"  {k:7s} {m[j]:+.4f} +- {se[j]:.4f}   z = {m[j]/se[j]:+.1f}")
    m, se = arr.sum(1).mean(0), arr.sum(1).std(0, ddof=1) / np.sqrt(len(arr))
    print("TOTAL:")
    for j, k in enumerate(GRAD_SITES):
        print(f"  {k:7s} {m[j]:+.4f} +- {se[j]:.4f}   z = {m[j]/se[j]:+.1f}")
    sys.stdout.flush()
