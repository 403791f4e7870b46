"""Measure the static-bracket hot path on the chip: speed x accuracy x n_det.

Compares, at bench width (64 chains, value+grad):
  * old tiled fetch (bf16-rounded, pre-round-5) vs new bracket path;
  * n_det in {1024, 512, 256};
and checks accuracy of the potential against a high-resolution oracle
(n_z=4096 gather-method evaluation of the same f32 model) over prior draws.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("tiled")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as lk
from bumpcosmology_tpu.inference.model import make_potential, prior_sample

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
key = jax.random.PRNGKey(0)


def timed(f, theta, n, width=None):
    vg = jax.value_and_grad(f)
    if width:
        inner = vg
        vg = lambda t: jax.vmap(inner)(t)

    @jax.jit
    def chain(t, _n):
        def body(i, carry):
            tt, acc = carry
            u, g = vg(tt)
            return tt + 1e-7 * jnp.tanh(g), acc + jnp.sum(u)

        return jax.lax.fori_loop(0, _n, body, (t, 0.0))

    out = chain(theta, 2)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = chain(theta, n)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / n


spec0 = lk.pop_cosmo_model_spec(data)
theta1 = prior_sample(spec0, key)
thetaW = jax.vmap(lambda k: prior_sample(spec0, k))(jax.random.split(key, 64))

# old path (brackets disabled)
_real_fb = lk._frame_brackets
lk._frame_brackets = lambda *a, **k: None
pot_old = make_potential(lk.pop_cosmo_model_spec(data))
t_old = timed(pot_old, thetaW, 30, width=64)
print(f"old tiled path      width64: {t_old*1e3:8.3f} ms ({t_old/64*1e6:6.1f} us/theta)", flush=True)
lk._frame_brackets = _real_fb

pots = {}
for n_det in (1024, 512, 256):
    pot = make_potential(lk.pop_cosmo_model_spec(data, n_det=n_det))
    pots[n_det] = pot
    t_new = timed(pot, thetaW, 30, width=64)
    print(
        f"bracket n_det={n_det:5d} width64: {t_new*1e3:8.3f} ms ({t_new/64*1e6:6.1f} us/theta)",
        flush=True,
    )

# accuracy: oracle = gather-method potential at n_z=4096 (f32, exact interp
# arithmetic, 4x finer detector grid)
set_default_method("gather")
lk._frame_brackets = lambda *a, **k: None
pot_oracle = jax.jit(make_potential(lk.pop_cosmo_model_spec(data, n_z=4096)))
lk._frame_brackets = _real_fb
set_default_method("tiled")

keys = jax.random.split(jax.random.PRNGKey(7), 24)
thetas = jax.vmap(lambda k: prior_sample(spec0, k))(keys)
oracle = np.array([float(pot_oracle(thetas[i])) for i in range(24)])
for n_det, pot in pots.items():
    jp = jax.jit(pot)
    vals = np.array([float(jp(thetas[i])) for i in range(24)])
    dev = np.abs(vals - oracle)
    print(f"n_det={n_det:5d}: |dU| vs 4096-gather oracle: max {dev.max():.4f} median {np.median(dev):.4f} nats")

# old-path accuracy for reference
set_default_method("tiled")
lk._frame_brackets = lambda *a, **k: None
pot_old_j = jax.jit(make_potential(lk.pop_cosmo_model_spec(data)))
lk._frame_brackets = _real_fb
vals = np.array([float(pot_old_j(thetas[i])) for i in range(24)])
dev = np.abs(vals - oracle)
print(f"old tiled (r4 default): |dU| max {dev.max():.4f} median {np.median(dev):.4f} nats")
print("done")
