"""PLPeak joint fit on the committed flagship catalog (v5e): does the second
family converge at the reference NUTS config, and at what cost?"""
import time
import numpy as np
import jax

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import plpeak_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.nuts import NutsConfig, run_warmup, run_sampling
from bumpcosmology_tpu.inference.sampler import _finite_prior_init
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method(None)
data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = plpeak_cosmo_model_spec(data)
pot = make_potential(spec)
key = jax.random.PRNGKey(20260819)
k1, k2, k3 = jax.random.split(key, 3)
theta0 = _finite_prior_init(spec, pot, k1, 4)
t0 = time.perf_counter()
warm, _ = run_warmup(pot, theta0, k2, 1000, NutsConfig())
jax.block_until_ready(warm.state.theta)
print(f"[plpeak flagship] warmup 1000x4 in {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
thetas, stats, _ = run_sampling(pot, warm, k3, 1000, NutsConfig())
jax.block_until_ready(thetas)
dt = time.perf_counter() - t0
depth = np.asarray(stats.tree_depth)
div = int(np.sum(np.asarray(stats.diverging)))
sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
min_site = min(st, key=lambda k: st[k]["ess"])
min_ess = st[min_site]["ess"]
print(f"[plpeak flagship] sampling 4000 draws in {dt:.0f}s ({4000/dt:.0f} d/s); "
      f"depth median {np.median(depth):.0f} p90 {np.percentile(depth,90):.0f}; div {div}; "
      f"min-ESS {min_ess:.0f} @ {min_site} ({min_ess/dt:.1f} ESS/s); "
      f"max rhat {max(s['rhat'] for s in st.values()):.4f}", flush=True)
for k in ("alpha", "beta_q", "mmin", "mmax", "lam_peak", "mu_m", "sigma_m", "delta_m", "h", "Om", "w"):
    s = st[k]
    print(f"  {k:10s} mean {np.mean(sites[k]):8.3f} sd {np.std(sites[k]):7.3f} "
          f"ess {s['ess']:6.0f} rhat {s['rhat']:.4f}", flush=True)
np.savez("/root/repo/scratch/r3b_plpeak_flagship_warm.npz",
         theta=np.asarray(warm.state.theta), eps=np.asarray(warm.eps),
         cov=np.asarray(warm.cov))
