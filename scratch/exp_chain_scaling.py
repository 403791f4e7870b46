"""Chain-count x max_depth scaling of flagship sampling on the TPU.

The vmapped NUTS tree loop is lockstep: each step costs the MAX leapfrogs
over the chain batch.  Measures draws/s, realized depth distribution, and
min-ESS/s for chains in {4, 16} and max_depth in {10, 7, 6}.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.nuts import NutsConfig, run_sampling
from bumpcosmology_tpu.utils.checkpoint import load_warmup

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = pop_cosmo_model_spec(data)
potential = make_potential(spec)

warm4 = load_warmup("/root/repo/benchmarks/flagship_warmup.npz")
warm16 = load_warmup("/root/repo/benchmarks/flagship_warmup16.npz")

N = 150
for label, warm in (("4ch", warm4), ("16ch", warm16)):
    for md in (10, 7, 6):
        cfg = NutsConfig(max_depth=md)
        out = run_sampling(potential, warm, jax.random.PRNGKey(1), 25, cfg)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        thetas, stats, _ = run_sampling(potential, warm, jax.random.PRNGKey(2), N, cfg)
        jax.block_until_ready(thetas)
        dt = time.perf_counter() - t0
        nch = thetas.shape[0]
        total = nch * N
        depths = np.asarray(stats.tree_depth)
        sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
        ess = min(
            s["ess"] for s in summary({k: v for k, v in sites.items() if v.ndim == 2}).values()
        )
        acc = float(np.mean(np.asarray(stats.accept_prob)))
        print(
            f"{label} md={md}: {total} draws {dt:6.1f}s ({total/dt:6.1f} dr/s) "
            f"minESS {ess:6.0f} ({ess/dt:6.2f} ESS/s) "
            f"depth p50/p90/max {np.percentile(depths,50):.0f}/{np.percentile(depths,90):.0f}/{depths.max():.0f} "
            f"accept {acc:.3f}",
            flush=True,
        )
