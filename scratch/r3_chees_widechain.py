"""Wide-chain warm-started ChEES scaling on the flagship joint fit (real chip).

Fixed-length jittered HMC has no ragged-tree tax, so total draw throughput
should scale with chains until the chip's eval cost goes linear in batch
width.  Two measurements:

1. value+grad eval wall vs batch width (1/4/16/64/256 thetas) via in-program
   scan — the hardware ceiling for chain scaling.
2. warm-started ChEES sampling throughput + direct min-ESS/s at 16/64/256
   chains, all using the SAME trajectory length adapted once at 16 chains
   (T is a property of the target, not of the chain count).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.chees import run_chees_from_warmup
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
SEED = 3281922803 % (2**31)
K = 50  # evals per scan program


def tile_warm(warm, factor):
    return jax.tree.map(
        lambda x: np.tile(np.asarray(x), (factor,) + (1,) * (np.ndim(x) - 1)), warm
    )


def stats_of(spec, thetas):
    sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
    st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    worst = min(st.items(), key=lambda kv: kv[1]["ess"])
    rhat = max(s["rhat"] for s in st.values())
    return worst[1]["ess"], worst[0], rhat


def scan_eval_time(potential, theta, n=3):
    vg = jax.value_and_grad(potential)
    if theta.ndim == 2:
        vg = jax.vmap(vg)

    @jax.jit
    def many(t):
        def body(c, _):
            v, g = vg(c)
            return c + 1e-12 * g, jnp.sum(v)

        c, vs = jax.lax.scan(body, t, None, length=K)
        return jnp.sum(vs)

    jax.block_until_ready(many(theta))
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(many(theta))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    dev = jax.devices()[0]
    set_default_method(None)  # backend default: tiled unit-spaced lookups

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm16 = jax.device_put(load_warmup(WARMUP16), dev)
    th16 = np.asarray(warm16.state.theta)

    # --- 1. eval-cost ceiling ---
    for width in (1, 4, 16, 64, 256):
        if width == 1:
            theta = jnp.asarray(th16[0])
        else:
            reps = max(1, width // 16)
            theta = jnp.asarray(np.tile(th16, (reps, 1))[:width])
        dt = scan_eval_time(potential, jax.device_put(theta, dev))
        print(
            f"[eval] width={width:4d}: {dt * 1e3:8.3f} ms/eval "
            f"({dt * 1e6 / width:8.2f} us/theta)",
            flush=True,
        )

    # --- 2. adapt T once at 16 chains ---
    key = jax.random.PRNGKey(SEED + 7)
    t0 = time.perf_counter()
    res = run_chees_from_warmup(
        potential, warm16, key, num_adapt=150, num_samples=0, verbose=True
    )
    print(f"[adapt] {time.perf_counter() - t0:.0f}s  T={float(res.trajectory_length):.4g}")
    init_steps = max(1, int(round(float(res.trajectory_length) / float(res.eps))))

    # --- 3. sampling throughput at 16/64/256 chains ---
    for nchains, ndraws in ((16, 400), (64, 300), (256, 150)):
        factor = nchains // 16
        warm = warm16 if factor == 1 else jax.device_put(tile_warm(warm16, factor), dev)
        # decorrelate the tiled replicas before timing: a short unrecorded run
        pre = run_chees_from_warmup(
            potential, warm, jax.random.PRNGKey(SEED + nchains), num_adapt=0,
            num_samples=25, init_steps=init_steps,
        )
        jax.block_until_ready(pre.thetas)
        t0 = time.perf_counter()
        res2 = run_chees_from_warmup(
            potential, pre.warm, jax.random.PRNGKey(SEED + 1000 + nchains),
            num_adapt=0, num_samples=ndraws, init_steps=init_steps,
        )
        jax.block_until_ready(res2.thetas)
        dt = time.perf_counter() - t0
        ess, worst, rhat = stats_of(spec, res2.thetas)
        total = nchains * ndraws
        acc = float(np.mean(np.asarray(res2.accept)))
        print(
            f"[chees/{nchains:3d}ch] {total} draws in {dt:.1f}s ({total / dt:.1f} draws/s), "
            f"accept {acc:.3f}, min-ESS {ess:.0f} @ {worst} ({ess / dt:.2f} ESS/s), "
            f"max rhat {rhat:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
