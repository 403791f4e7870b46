"""Sweep the new hot path: n_det x mass-fetch tile, + accuracy vs oracle."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import importlib

interp_mod = importlib.import_module("bumpcosmology_tpu.ops.interp")

interp_mod.set_default_method("tiled")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as lk
from bumpcosmology_tpu.inference.model import make_potential, prior_sample

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
key = jax.random.PRNGKey(0)
spec0 = lk.pop_cosmo_model_spec(data)
thetaW = jax.vmap(lambda k: prior_sample(spec0, k))(jax.random.split(key, 64))
_orig_tiled = interp_mod.interp_unit_tiled


def set_tile(tile):
    if tile == 32:
        interp_mod.interp_unit_tiled = _orig_tiled
    else:
        interp_mod.interp_unit_tiled = functools.partial(_orig_tiled, tile=tile)


def timed64(pot, n=30):
    vg = jax.vmap(jax.value_and_grad(pot))

    @jax.jit
    def chain(t, _n):
        def body(i, carry):
            tt, acc = carry
            u, g = vg(tt)
            return tt + 1e-7 * jnp.tanh(g), acc + jnp.sum(u)

        return jax.lax.fori_loop(0, _n, body, (t, 0.0))

    out = chain(thetaW, 2)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = chain(thetaW, n)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / n


results = {}
for n_det in (512, 256, 1024):
    for tile in (32, 16, 8):
        set_tile(tile)
        pot = make_potential(lk.pop_cosmo_model_spec(data, n_det=n_det))
        dt = timed64(pot)
        results[(n_det, tile)] = dt
        print(f"n_det={n_det:5d} tile={tile:3d}: {dt*1e3:7.3f} ms ({dt/64*1e6:6.1f} us/theta)", flush=True)
set_tile(32)

# accuracy vs oracle: gather method, n_z=4096, no brackets
interp_mod.set_default_method("gather")
_fb = lk._frame_brackets
lk._frame_brackets = lambda *a, **k: None
pot_oracle = jax.jit(make_potential(lk.pop_cosmo_model_spec(data, n_z=4096)))
lk._frame_brackets = _fb
interp_mod.set_default_method("tiled")

keys = jax.random.split(jax.random.PRNGKey(7), 24)
thetas = jax.vmap(lambda k: prior_sample(spec0, k))(keys)
oracle = np.array([float(pot_oracle(thetas[i])) for i in range(24)])
print("oracle range:", oracle.min(), oracle.max(), flush=True)
for n_det in (1024, 512, 256):
    jp = jax.jit(make_potential(lk.pop_cosmo_model_spec(data, n_det=n_det)))
    vals = np.array([float(jp(thetas[i])) for i in range(24)])
    dev = np.abs(vals - oracle)
    print(f"n_det={n_det:5d}: |dU| vs oracle: max {dev.max():.4f} median {np.median(dev):.4f} nats", flush=True)
print("done")
