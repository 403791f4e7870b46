"""Profile the fused Pallas log-weight kernel vs the XLA tiled path on TPU.

Times the flagship-shaped joint value+grad under both implementations and a
short sampling burst from the committed warmup checkpoint.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method("matmul")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference import likelihoods as L
from bumpcosmology_tpu.inference.model import make_potential, prior_sample, constrain
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec

data = flagship_pop_cosmo_data()
spec = pop_cosmo_model_spec(data)
print(f"catalog: events {data.events.a.shape}, nsel {data.selection.a.shape}", flush=True)

theta = prior_sample(spec, jax.random.PRNGKey(0))
vg = jax.jit(jax.value_and_grad(make_potential(spec)))

def bench(tag):
    u, g = vg(theta)
    jax.block_until_ready((u, g))  # compile
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        u, g = vg(theta)
    jax.block_until_ready((u, g))
    dt = (time.perf_counter() - t0) / n
    gflat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(g)])
    print(f"[{tag}] value+grad {dt*1e3:.3f} ms/eval  U={float(u):+.3f}  |g|={np.linalg.norm(gflat):.4f}", flush=True)
    return float(u), gflat

L.set_logwts_impl("xla")
u_x, g_x = bench("xla  ")
L.set_logwts_impl("pallas")
u_p, g_p = bench("pallas")
print(f"value dev {abs(u_p-u_x):.3e}; grad max rel dev "
      f"{np.max(np.abs(g_p-g_x)/(np.abs(g_x)+1e-6)):.3e}", flush=True)

# batched (16-chain-like) eval
thetas = prior_sample(spec, jax.random.PRNGKey(1), shape=(16,))
vgb = jax.jit(jax.vmap(jax.value_and_grad(make_potential(spec))))
def bench_b(tag):
    out = vgb(thetas); jax.block_until_ready(out)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = vgb(thetas)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] 16-wide value+grad {dt*1e3:.3f} ms/batch ({dt/16*1e3:.3f} ms/theta)", flush=True)

L.set_logwts_impl("xla")
bench_b("xla  ")
L.set_logwts_impl("pallas")
bench_b("pallas")
L.set_logwts_impl(None)
