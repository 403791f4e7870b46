"""Error budget for the detector-grid resolution n_det (CPU, f32 vs f64).

Isolates interp-resolution truncation: same arithmetic (gather method on
true CPU), flagship catalog, potentials at n_det in {256, 512, 1024} (f32,
bracket path disabled so n_det acts through the fused table) vs the f64
n_z=8192 oracle.  Reported: |dU| decomposed as (f32 noise at n_det=1024)
vs (extra truncation at coarser n_det, measured f64-vs-f64).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import importlib

interp_mod = importlib.import_module("bumpcosmology_tpu.ops.interp")
interp_mod.set_default_method("gather")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as lk
from bumpcosmology_tpu.inference.model import make_potential, prior_sample

data32 = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
data64 = jax.tree.map(
    lambda x: jnp.asarray(np.asarray(x), jnp.float64)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    else x,
    data32,
)

spec0 = lk.pop_cosmo_model_spec(data64)
keys = jax.random.split(jax.random.PRNGKey(7), 16)
thetas = [prior_sample(spec0, k) for k in keys]

# oracle: f64, n_z = 8192, old fused path (no brackets)
_fb = lk._frame_brackets
lk._frame_brackets = lambda *a, **k: None
pot_oracle = jax.jit(make_potential(lk.pop_cosmo_model_spec(data64, n_z=8192)))
oracle = np.array([float(pot_oracle(t)) for t in thetas])
print("oracle (f64, n_z=8192):", np.round(oracle[:4], 4), flush=True)

# f64 truncation-only at each n_det (bracket path, f64)
for n_det in (1024, 512, 256):
    lk._frame_brackets = _fb
    pot = jax.jit(make_potential(lk.pop_cosmo_model_spec(data64, n_det=n_det)))
    vals = np.array([float(pot(t)) for t in thetas])
    dev = np.abs(vals - oracle)
    print(f"f64 bracket n_det={n_det:5d}: |dU| max {dev.max():.5f} median {np.median(dev):.5f} nats", flush=True)
print("done")
