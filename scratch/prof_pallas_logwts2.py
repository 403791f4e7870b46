"""Pallas vs XLA logwts at the COMMITTED flagship catalog (24k injections)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method("matmul")
from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as L
from bumpcosmology_tpu.inference.model import make_potential, prior_sample
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec

data = flagship_pop_cosmo_data(path="benchmarks/flagship_catalog.npz")
spec = pop_cosmo_model_spec(data)
print(f"catalog: events {data.events.a.shape}, nsel {data.selection.a.shape}", flush=True)

for width in (1, 4, 16):
    thetas = prior_sample(spec, jax.random.PRNGKey(1), shape=(width,))
    vgb = jax.jit(jax.vmap(jax.value_and_grad(make_potential(spec))))
    for impl in ("xla", "pallas"):
        L.set_logwts_impl(impl)
        out = vgb(thetas); jax.block_until_ready(out)
        n = max(30, 200 // width)
        t0 = time.perf_counter()
        for _ in range(n):
            out = vgb(thetas)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        u = np.asarray(out[0])
        print(f"[{impl:6s}] width {width:2d}: {dt*1e3:8.3f} ms/batch ({dt/width*1e3:7.3f} ms/theta)  U0={u[0]:+.3f}", flush=True)
L.set_logwts_impl(None)
