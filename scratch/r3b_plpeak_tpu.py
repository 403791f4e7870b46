"""PLPeak sampling-geometry probe on the v5e: tree depth, timings, hybrid.

The round-3 verify run showed the 56-event PLPeak warmup ~5-10x slower per
step than the bump family on CPU.  Measure on the TPU: NUTS depth histogram
+ ESS/s at the same synthetic catalog, then the nuts+chees hybrid from the
same warmup.
"""
import time
import numpy as np
import jax

from bumpcosmology_tpu.inference.likelihoods import plpeak_model_spec, pop_model_spec
from bumpcosmology_tpu.inference.model import make_potential, prior_sample
from bumpcosmology_tpu.inference.nuts import NutsConfig, run_warmup, run_sampling
from bumpcosmology_tpu.inference.chees import run_chees_from_warmup, CheesConfig
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.model import constrain
from bumpcosmology_tpu.inference.sampler import _finite_prior_init
from bumpcosmology_tpu.testing import synthetic_pop_data
from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method(None)
data = synthetic_pop_data(seed=7)

for name, spec_fn in (("bump", pop_model_spec), ("plpeak", plpeak_model_spec)):
    spec = spec_fn(data, n_grid=256)
    pot = make_potential(spec)
    key = jax.random.PRNGKey(11)
    k1, k2, k3 = jax.random.split(key, 3)
    theta0 = _finite_prior_init(spec, pot, k1, 4)
    t0 = time.perf_counter()
    warm, wstats = run_warmup(pot, theta0, k2, 500, NutsConfig())
    jax.block_until_ready(warm.state.theta)
    t_w = time.perf_counter() - t0
    t0 = time.perf_counter()
    thetas, stats, _ = run_sampling(pot, warm, k3, 400, NutsConfig())
    jax.block_until_ready(thetas)
    t_s = time.perf_counter() - t0
    depth = np.asarray(stats.tree_depth)
    div = int(np.sum(np.asarray(stats.diverging)))
    sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
    st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    min_ess = min(s["ess"] for s in st.values())
    min_site = min(st, key=lambda k: st[k]["ess"])
    rhat = max(s["rhat"] for s in st.values())
    print(f"[{name}] warmup 500x4 in {t_w:.0f}s; sampling 1600 draws in {t_s:.0f}s "
          f"({1600/t_s:.0f} d/s); depth median {np.median(depth):.0f} p90 "
          f"{np.percentile(depth, 90):.0f}; div {div}; min-ESS {min_ess:.0f} @ {min_site} "
          f"({min_ess/t_s:.1f} ESS/s); max rhat {rhat:.4f}", flush=True)
    if name == "plpeak":
        t0 = time.perf_counter()
        res = run_chees_from_warmup(pot, warm, jax.random.PRNGKey(5), num_adapt=100,
                                    num_samples=400, cfg=CheesConfig(max_leapfrogs=96))
        jax.block_until_ready(res.thetas)
        t_h = time.perf_counter() - t0
        sites = {k: np.asarray(v) for k, v in constrain(spec, res.thetas).items()}
        st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
        min_ess = min(s["ess"] for s in st.values())
        rhat = max(s["rhat"] for s in st.values())
        print(f"[plpeak hybrid] adapt+sample in {t_h:.0f}s, ~{res.n_leapfrog} lf/draw, "
              f"accept {float(np.mean(np.asarray(res.accept))):.2f}, min-ESS {min_ess:.0f} "
              f"({min_ess/t_h:.1f} ESS/s incl adapt); max rhat {rhat:.4f}", flush=True)
