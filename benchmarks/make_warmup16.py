"""Build the 16-chain flagship adapted state from the 4-chain checkpoint.

The 4-chain ``flagship_warmup.npz`` holds converged positions + per-chain
adapted (eps, dense mass).  A 16-chain stationary ensemble follows without
re-running warmup: tile each chain's kernel 4x and start the copies from
spaced draws of a short sampling run of that chain (posterior draws => the
copies are stationary from step one).

Writes benchmarks/flagship_warmup16.npz.  Run on the TPU (~1 min after
compile).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

PLATFORM = jax.devices()[0].platform
set_default_method(None if PLATFORM in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import make_potential
from bumpcosmology_tpu.inference.nuts import ChainState, NutsConfig, WarmupResult, run_sampling
from bumpcosmology_tpu.utils.checkpoint import load_warmup, save_warmup

import os
REPLICAS = int(os.environ.get("REPLICAS", "4"))
DRAWS = 120

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = pop_cosmo_model_spec(data)
potential = make_potential(spec)
warm = load_warmup("/root/repo/benchmarks/flagship_warmup.npz")

t0 = time.perf_counter()
thetas, stats, _ = run_sampling(
    potential, warm, jax.random.PRNGKey(99), DRAWS, NutsConfig()
)
jax.block_until_ready(thetas)
print(f"{DRAWS} draws x 4 chains in {time.perf_counter() - t0:.1f}s")

# spaced draws per chain as start positions for the replicas
picks = np.linspace(max(DRAWS // REPLICAS - 1, 1), DRAWS - 1, REPLICAS).astype(int)
theta16 = jnp.concatenate([thetas[:, p] for p in picks], axis=0)  # (16, dim)

# evaluate in 4-wide batches: reuses the 4-chain program shape the sampler
# already compiled instead of paying a fresh width-16 compile
vg4 = jax.jit(jax.vmap(jax.value_and_grad(potential)))
parts = [vg4(theta16[lo : lo + 4]) for lo in range(0, theta16.shape[0], 4)]
u16 = jnp.concatenate([p[0] for p in parts], axis=0)
grad16 = jnp.concatenate([p[1] for p in parts], axis=0)
assert np.all(np.isfinite(np.asarray(u16)))

tile = lambda x: jnp.concatenate([x] * REPLICAS, axis=0)
warm16 = WarmupResult(
    state=ChainState(theta=theta16, u=u16, grad=grad16),
    eps=tile(warm.eps),
    cov=tile(warm.cov),
    chol_cov=tile(warm.chol_cov),
)
out = f"/root/repo/benchmarks/flagship_warmup{4*REPLICAS}.npz"
save_warmup(out, warm16)
print("saved", out,
      {k: tuple(np.asarray(v).shape) for k, v in
       {"theta": warm16.state.theta, "eps": warm16.eps, "cov": warm16.cov}.items()})
