"""Generate the float64 golden trace for the JOINT (pop+cosmology) model.

Reference-scale catalog (56 events x 128 PE samples, 1024 selection
injections — ``run_cosmo_fit.py:21-53`` / SURVEY.md §6) fit in float64 on CPU
at the reference NUTS config.  The posterior draws are committed as
``benchmarks/golden_joint_f64.npz`` and serve as the independent-precision
oracle for ``tests/test_f64_crosscheck.py::test_joint_f32_matches_f64_golden``
(VERDICT r2 next-round #3): any f32-on-TPU numerics drift in the z(dL)
inversion, detector-table interpolation, or selection logsumexp shows up as a
mean shift beyond MC error against this artifact.

Run:  PYTHONPATH=/root/repo python benchmarks/make_f64_joint_golden.py
"""
import json
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.benchdata import mock_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.sampler import fit

CONFIG = dict(
    nobs=56, nsamp=128, nsel=1024, ndraw_campaign=400_000, threshold=20.0,
    seed=909, n_grid=256, n_z=1024, num_warmup=1000, num_samples=1000,
    num_chains=4, fit_seed=3281922803,  # the reference's own seed (run_fit.py:14)
)

if __name__ == "__main__":
    t0 = time.time()
    data = mock_pop_cosmo_data(
        nobs=CONFIG["nobs"], nsamp=CONFIG["nsamp"], nsel=CONFIG["nsel"],
        ndraw_campaign=CONFIG["ndraw_campaign"], threshold=CONFIG["threshold"],
        seed=CONFIG["seed"], dtype=jnp.float64,
    )
    assert data.events.a.dtype == jnp.float64
    spec = pop_cosmo_model_spec(data, n_grid=CONFIG["n_grid"], n_z=CONFIG["n_z"])
    # checkpoint the (2h-on-one-core) warmup + sampling chunks: a killed run
    # resumes instead of restarting (inference/sampler.py checkpoint_path)
    res = fit(
        spec, jax.random.PRNGKey(CONFIG["fit_seed"]),
        num_warmup=CONFIG["num_warmup"], num_samples=CONFIG["num_samples"],
        num_chains=CONFIG["num_chains"], verbose=True,
        checkpoint_path=os.path.join(os.path.dirname(__file__), "golden_f64_ckpt.npz"),
    )
    summ = res.summary()
    for site, s in sorted(summ.items()):
        print(f"{site:10s} mean {s['mean']:+.4f} sd {s['sd']:.4f} "
              f"ess {s['ess']:.0f} rhat {s['rhat']:.4f}")
    bad = [k for k, v in summ.items() if v["rhat"] > 1.02]
    if bad:
        print(f"WARNING: rhat > 1.02 at {bad} — rerun with a larger budget")
    out = os.path.join(os.path.dirname(__file__), "golden_joint_f64.npz")
    np.savez_compressed(
        out,
        config=json.dumps(CONFIG),
        divergences=int(res.sample_stats["diverging"].sum()),
        **{f"post_{k}": np.asarray(v) for k, v in res.posterior.items() if np.ndim(v) == 2},
    )
    print(f"wrote {out} in {(time.time() - t0) / 60:.1f} min")
