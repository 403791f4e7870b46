"""Round-3 TPU chores, one tunnel session:

1. Flagship joint fit at the reference NUTS config on the REGENERATED
   catalog (24576 unique injections) — convergence + selection-noise check.
2. Save the adapted state as benchmarks/flagship_warmup.npz (4 chains).
3. Build benchmarks/flagship_warmup16.npz (kernel tiling + spaced draws).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import (
    pop_cosmo_deterministics,
    pop_cosmo_model_spec,
)
from bumpcosmology_tpu.inference.model import make_potential
from bumpcosmology_tpu.inference.nuts import ChainState, NutsConfig, WarmupResult, run_sampling
from bumpcosmology_tpu.inference.sampler import fit
from bumpcosmology_tpu.utils.checkpoint import save_warmup

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
print(f"# catalog: {data.events.a.shape}, {data.selection.a.shape[0]} injections", flush=True)
spec = pop_cosmo_model_spec(data)

t0 = time.perf_counter()
res = fit(
    spec, jax.random.PRNGKey(3281922803 % (2**31)),
    num_warmup=1000, num_samples=1000, num_chains=4,
    cfg=NutsConfig(),
    deterministics_fn=lambda s: pop_cosmo_deterministics(s, data),
    verbose=True,
)
wall = time.perf_counter() - t0
summ = res.summary()
for site, s in sorted(summ.items()):
    print(f"{site:22s} {s['mean']:9.3f} {s['sd']:7.3f} rhat {s['rhat']:.4f} ess {s['ess']:7.0f}")
post = res.posterior
print(f"\nmax rhat: {max(s['rhat'] for s in summ.values()):.4f}")
print(f"min ESS : {min(s['ess'] for s in summ.values()):.0f} / 4000")
print(f"divergences: {int(res.sample_stats['diverging'].sum())}")
noise = np.asarray(post["selection_noise_nats"]).reshape(-1)
print(f"selection_noise_nats: median {np.median(noise):.3f} q90 {np.quantile(noise, 0.9):.3f}")
print(f"wall={wall:.1f}s", flush=True)
assert np.median(noise) < 1.0, "selection noise still above the 1-nat bar!"

save_warmup("/root/repo/benchmarks/flagship_warmup.npz", res.warmup_state)
print("saved flagship_warmup.npz", flush=True)

# 16-chain stationary ensemble: tile each adapted kernel onto 4 spaced draws
potential = make_potential(spec)
warm = res.warmup_state
REPLICAS, DRAWS = 4, 120
thetas, stats, _ = run_sampling(potential, warm, jax.random.PRNGKey(99), DRAWS, NutsConfig())
jax.block_until_ready(thetas)
picks = np.linspace(max(DRAWS // REPLICAS - 1, 1), DRAWS - 1, REPLICAS).astype(int)
theta16 = jnp.concatenate([thetas[:, p] for p in picks], axis=0)
u16, grad16 = jax.vmap(jax.value_and_grad(potential))(theta16)
assert np.all(np.isfinite(np.asarray(u16)))
tile = lambda x: jnp.concatenate([x] * REPLICAS, axis=0)
warm16 = WarmupResult(
    state=ChainState(theta=theta16, u=u16, grad=grad16),
    eps=tile(warm.eps), cov=tile(warm.cov), chol_cov=tile(warm.chol_cov),
)
save_warmup("/root/repo/benchmarks/flagship_warmup16.npz", warm16)
print("saved flagship_warmup16.npz", flush=True)
