"""Flagship joint fit at the reference NUTS config on the flagship catalog.

Usage:
  EXP_PLATFORM=tpu|cpu EXP_CHAINS=4 EXP_WARMUP=1000 EXP_SAMPLES=1000 \
      python scratch/exp_flagship.py

Prints R-hat / ESS / tree depth / throughput; saves posterior + state to
scratch/flagship_<platform>.npz.
"""
import os
import sys
import time

PLATFORM = os.environ.get("EXP_PLATFORM", "tpu")
import jax

if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    pop_cosmo_deterministics,
    pop_cosmo_model_spec,
)
from bumpcosmology_tpu.inference.nuts import NutsConfig
from bumpcosmology_tpu.inference.sampler import fit

NCHAINS = int(os.environ.get("EXP_CHAINS", "4"))
NWARM = int(os.environ.get("EXP_WARMUP", "1000"))
NSAMP = int(os.environ.get("EXP_SAMPLES", "1000"))
SHARED = os.environ.get("EXP_SHARED", "0") == "1"

print(f"# platform={jax.devices()[0].platform} chains={NCHAINS} "
      f"warmup={NWARM} samples={NSAMP} shared_mass={SHARED}", flush=True)

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
print(f"# catalog: {data.events.a.shape} events x samples, "
      f"{data.selection.a.shape[0]} injections", flush=True)

spec = pop_cosmo_model_spec(data)
cfg = NutsConfig(shared_mass=SHARED)

t0 = time.perf_counter()
res = fit(
    spec,
    jax.random.PRNGKey(int(os.environ.get("EXP_SEED", "3281922803")) % (2**31)),
    num_warmup=NWARM,
    num_samples=NSAMP,
    num_chains=NCHAINS,
    cfg=cfg,
    deterministics_fn=lambda s: pop_cosmo_deterministics(s, data),
    verbose=True,
)
wall = time.perf_counter() - t0

summ = res.summary()
print("\nsite        mean      sd     rhat     ess")
for k, s in summ.items():
    print(f"{k:10s} {s['mean']:8.3f} {s['sd']:7.3f} {s['rhat']:7.3f} {s['ess']:8.0f}")

rhats = [s["rhat"] for s in summ.values()]
esss = [s["ess"] for s in summ.values()]
depth = np.median(res.sample_stats["tree_depth"])
nlf = np.mean(res.sample_stats["n_leapfrog"])
total = NCHAINS * NSAMP
print(f"\nmax rhat     : {max(rhats):.4f}")
print(f"min ESS      : {min(esss):.0f} / {total}")
print(f"median depth : {depth:.0f}  (mean leapfrogs/draw {nlf:.0f})")
print(f"divergences  : {res.sample_stats['diverging'].sum():.0f}")
print(f"warmup_s={res.timings.get('warmup_s', float('nan')):.1f} "
      f"sampling_s={res.timings['sampling_s']:.1f} wall={wall:.1f}")
print(f"min-ESS/s (sampling): {min(esss)/res.timings['sampling_s']:.3f}")

out = f"/root/repo/scratch/flagship_{PLATFORM}.npz"
np.savez(
    out,
    **{f"post_{k}": v for k, v in res.posterior.items()},
    tree_depth=res.sample_stats["tree_depth"],
    n_leapfrog=res.sample_stats["n_leapfrog"],
    warmup_s=res.timings.get("warmup_s", np.nan),
    sampling_s=res.timings["sampling_s"],
)
print("saved", out, flush=True)
