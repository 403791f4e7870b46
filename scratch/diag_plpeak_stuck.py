"""Why are plpeak SBC fleet chains stuck? One-sim drilldown on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method(None if jax.devices()[0].platform in ("tpu", "axon") else "gather")
from bumpcosmology_tpu.inference.calibration import (
    make_mock_pop_cosmo_simulator_fresh, make_plpeak_cosmo_sbc_spec_builder,
)
from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample, unconstrain
from bumpcosmology_tpu.inference.sampler import fit
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.mock import draw_injection_campaign

inj = draw_injection_campaign(ndraw=3_000_000, seed=11, snr_chunk=65536)
print("campaign:", len(inj), flush=True)
builder = make_plpeak_cosmo_sbc_spec_builder(n_grid=128, n_z=256)
proto = builder(None)
rng = np.random.default_rng(12)
key = jax.random.PRNGKey(13)
theta_true = prior_sample(proto, key)
sites = {k: np.asarray(v) for k, v in constrain(proto, theta_true).items()}
print("truth:", {k: round(float(v), 3) for k, v in sites.items()}, flush=True)
sim = make_mock_pop_cosmo_simulator_fresh(
    inj, nobs=16, nsamp=256, nsel=1500, pe_bank_size=16384,
    threshold=20.0, family="plpeak",
)
data = sim(rng, sites)
spec = builder(data)
pot = make_potential(spec)

# potential at truth and at prior candidates
u_true = float(pot(theta_true))
print("U(truth):", u_true, flush=True)
cands = prior_sample(spec, jax.random.PRNGKey(14), shape=(32,))
us = jax.vmap(pot)(cands)
print("U(prior draws): finite", int(jnp.isfinite(us).sum()), "/32,",
      "range", float(jnp.nanmin(us)), float(jnp.nanmax(us)), flush=True)
g = jax.vmap(jax.grad(pot))(cands)
print("grad finite rows:", int(jnp.all(jnp.isfinite(g), axis=1).sum()), "/32", flush=True)
gt = jax.grad(pot)(theta_true)
print("grad(truth) finite:", bool(jnp.all(jnp.isfinite(gt))), flush=True)

# short real fit
t0 = time.time()
res = fit(spec, jax.random.PRNGKey(15), num_warmup=600, num_samples=256,
          num_chains=1, verbose=True)
st = summary(res.posterior)
for k in ("mmin", "alpha", "h", "lam"):
    s = st[k]
    print(f"{k:8s} mean={s['mean']:.3f} sd={s['sd']:.4f} ess={s['ess']:.0f} truth={sites[k]:.3f}")
print("accept:", float(np.mean(res.sample_stats["accept_prob"])),
      "div:", int(np.sum(res.sample_stats["diverging"])),
      "depth:", float(np.median(res.sample_stats["tree_depth"])), flush=True)
