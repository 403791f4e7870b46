"""Re-measure the Pallas fused log-weights kernel vs XLA at bench width.

Round-3 measured parity at the then-current shapes; the flagship catalog has
since grown (24576 selection atoms) and the bench runs 64 vmapped chains.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("tiled")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as lk
from bumpcosmology_tpu.inference.model import make_potential, prior_sample

data = flagship_pop_cosmo_data("/root/repo/benchmarks/flagship_catalog.npz")
spec = lk.pop_cosmo_model_spec(data)
key = jax.random.PRNGKey(0)


def timed(f, theta, n, width=None):
    vg = jax.value_and_grad(f)
    if width:
        vg_inner = vg
        vg = lambda t: jax.vmap(vg_inner)(t)

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


theta1 = prior_sample(spec, key)
thetaW = jax.vmap(lambda k: prior_sample(spec, k))(jax.random.split(key, 64))
pot = make_potential(spec)

for impl in ("xla", "pallas"):
    lk.set_logwts_impl(impl)
    try:
        t1 = timed(pot, theta1, 100)
        tW = timed(pot, thetaW, 30, width=64)
        print(f"{impl:7s} width 1: {t1*1e3:7.3f} ms   width 64: {tW*1e3:8.3f} ms ({tW/64*1e6:6.1f} us/theta)", flush=True)
    except Exception as e:
        print(f"{impl}: FAILED {type(e).__name__}: {e}")
lk.set_logwts_impl(None)
