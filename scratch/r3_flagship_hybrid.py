"""Flagship joint fit with the production hybrid sampler (nuts+chees).

Same workload as the reference-config convergence experiment
(scratch/tpu_round3_chores.py — 24,576-injection catalog, 1000 NUTS warmup,
4 chains) but the sampling phase is fixed-length jittered HMC at the
ChEES-adapted trajectory length.  Pass criteria: max R̂ < 1.01, healthy ESS,
selection noise under the 1-nat bar, and the posterior matching the NUTS
golden run on the SAME catalog within MC error (the sampler-correctness
check; truth-recovery on a single catalog is confounded by the realized
catalog's own offsets — this mock realization centers λ at 6.39 vs the
fiducial 4.7 under BOTH samplers, see scratch/tpu_chores.log).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    pop_cosmo_deterministics,
    pop_cosmo_model_spec,
)
from bumpcosmology_tpu.inference.sampler import fit
from bumpcosmology_tpu.models.parameters import DEFAULT_MASS, DEFAULT_REDSHIFT

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
print(f"# catalog: {data.events.a.shape}, {data.selection.a.shape[0]} injections", flush=True)
spec = pop_cosmo_model_spec(data)

t0 = time.perf_counter()
res = fit(
    spec, jax.random.PRNGKey(3281922803 % (2**31)),
    num_warmup=1000, num_samples=1000, num_chains=4,
    sampler="nuts+chees",
    deterministics_fn=lambda s: pop_cosmo_deterministics(s, data),
    verbose=True,
)
wall = time.perf_counter() - t0
summ = res.summary()
for site, s in sorted(summ.items()):
    print(f"{site:22s} {s['mean']:9.3f} {s['sd']:7.3f} rhat {s['rhat']:.4f} ess {s['ess']:7.0f}")
post = res.posterior
max_rhat = max(s["rhat"] for s in summ.values())
min_ess = min(s["ess"] for s in summ.values())
print(f"\nmax rhat: {max_rhat:.4f}")
print(f"min ESS : {min_ess:.0f} / 4000")
noise = np.asarray(post["selection_noise_nats"]).reshape(-1)
print(f"selection_noise_nats: median {np.median(noise):.3f} q90 {np.quantile(noise, 0.9):.3f}")
print(f"wall={wall:.1f}s (sampling {res.timings['sampling_s']:.1f}s)", flush=True)

# sampler correctness: match the NUTS golden posterior on this catalog
# (scratch/tpu_chores.log, reference NUTS config, same seed family)
NUTS_GOLDEN = {  # site: (mean, sd, ess)
    "a": (2.281, 0.404, 2765), "b": (0.784, 0.884, 1616),
    "beta": (-0.314, 0.995, 2516), "c": (2.118, 1.140, 2377),
    "dkappa": (3.505, 1.429, 3424), "dmbhmax": (4.532, 1.761, 2836),
    "h": (0.826, 0.125, 2694), "Om": (0.369, 0.138, 2300),
    "w": (-0.961, 0.223, 3600), "lam": (6.386, 0.302, 3545),
    "log_fpl": (-3.729, 0.914, 3194), "mpisn": (30.272, 2.520, 2668),
    "sigma": (2.197, 0.813, 1857), "zp": (2.523, 0.596, 1719),
}
bad = []
for site, (gm, gsd, gess) in NUTS_GOLDEN.items():
    s = summ[site]
    # two-sample z on the means, each mean's SE ≈ sd/sqrt(ESS)
    se = (s["sd"] ** 2 / s["ess"] + gsd**2 / gess) ** 0.5
    zscore = (s["mean"] - gm) / se
    ratio = s["sd"] / gsd
    print(f"vs-nuts {site:8s}: z = {zscore:+.2f}  sd ratio {ratio:.3f}")
    if abs(zscore) > 4.0 or not (0.8 < ratio < 1.25):
        bad.append((site, zscore, ratio))
# the fiducial truth, for the record (catalog-realization offsets included)
for site, tv in (("lam", DEFAULT_REDSHIFT.lam), ("mpisn", DEFAULT_MASS.mpisn)):
    s = summ[site]
    print(f"truth   {site:8s}: z = {(s['mean'] - tv) / max(s['sd'], 1e-9):+.2f}")
assert max_rhat < 1.01, max_rhat
assert not bad, bad
print("FLAGSHIP-HYBRID OK")
