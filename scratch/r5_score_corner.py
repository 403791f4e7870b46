import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from bumpcosmology_tpu.inference.calibration import make_mock_pop_cosmo_simulator_fresh
from bumpcosmology_tpu.inference.score_check import joint_term_grads, score_identity_check
from bumpcosmology_tpu.inference.likelihoods import MASS_FAMILIES
from bumpcosmology_tpu.mock import draw_injection_campaign
from bumpcosmology_tpu.models.brokenpl import DEFAULT_BROKENPL_POPULATION
from bumpcosmology_tpu.models.parameters import PLANCK18

build = MASS_FAMILIES["brokenpl"].build
inj = draw_injection_campaign(ndraw=6_500_000, seed=951007, snr_chunk=65536)
print("campaign drawn", len(inj), flush=True)
simulate = make_mock_pop_cosmo_simulator_fresh(
    inj, nobs=16, nsamp=256, nsel=3584, pe_bank_size=16384, threshold=20.0,
    family="brokenpl",
)
mp, rp = DEFAULT_BROKENPL_POPULATION.mass, DEFAULT_BROKENPL_POPULATION.redshift
base = {"h": PLANCK18.h, "Om": PLANCK18.Om, "w": PLANCK18.w, "R_unit": 0.0,
        "alpha1": mp.alpha1, "alpha2": mp.alpha2, "bfrac": mp.bfrac,
        "beta_q": mp.beta_q, "mmin": mp.mmin, "mmax": mp.mmax,
        "delta_m": mp.delta_m, "lam": rp.lam, "dkappa": rp.kappa - rp.lam,
        "zp": rp.zp}
corner = dict(base, mmin=3.0, delta_m=1.5)
for tag, sites0 in (("fiducial@951007", base), ("corner mmin=3 dm=1.5", corner)):
    grad_sites = tuple(k for k in sites0 if k != "R_unit")
    tg = joint_term_grads(sites0, grad_sites, nobs=16, n_grid=128, n_z=256, build=build)
    t0 = time.perf_counter()
    res = score_identity_check(simulate, sites0, tg, grad_sites, n_catalogs=120,
                               seed=424242)
    z_tot = dict(zip(res.sites, res.z[2]))
    print(f"[{tag}] {(time.perf_counter()-t0)/60:.1f} min  TOTAL z:",
          {k: round(float(v), 1) for k, v in z_tot.items()}, flush=True)
print("done", flush=True)
