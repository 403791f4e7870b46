"""Warm-started ChEES vs NUTS on the flagship joint fit (real chip).

NUTS baseline (scratch/verify_bench_err.log): 4ch 37.9 / 16ch 36.1 / 64ch
17.4 min-ESS/s — total draw throughput FALLS with chains (ragged-tree tax).
Here: NUTS-adapted (eps, dense mass, positions) -> adapt T only (ChEES) ->
jittered fixed-budget sampling, at 16 and 64 chains.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.chees import CheesConfig, run_chees_from_warmup
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.nuts import WarmupResult
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
SEED = 3281922803 % (2**31)


def tile_warm(warm, factor):
    return jax.tree.map(
        lambda x: np.tile(np.asarray(x), (factor,) + (1,) * (np.ndim(x) - 1)), warm
    )


def stats_of(spec, thetas):
    sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
    st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    worst = min(st.items(), key=lambda kv: kv[1]["ess"])
    rhat = max(s["rhat"] for s in st.values())
    return worst[1]["ess"], worst[0], rhat, st


def main():
    plat = None
    for p in ("tpu", "axon"):
        try:
            if jax.devices(p):
                plat = p
                break
        except RuntimeError:
            continue
    assert plat
    dev = jax.devices(plat)[0]
    set_default_method("matmul")

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm16 = jax.device_put(load_warmup(WARMUP16), dev)

    for nchains, ndraws in ((16, 400), (64, 200)):
        warm = warm16 if nchains == 16 else jax.device_put(tile_warm(warm16, 4), dev)
        key = jax.random.PRNGKey(SEED + nchains)
        t0 = time.perf_counter()
        res = run_chees_from_warmup(
            potential, warm, key, num_adapt=150, num_samples=50, verbose=True
        )
        jax.block_until_ready(res.thetas)
        t_adapt = time.perf_counter() - t0

        # timed sampling phase on the adapted kernel (fresh draws, post-compile)
        t0 = time.perf_counter()
        res2 = run_chees_from_warmup(
            potential, res.warm, jax.random.PRNGKey(SEED + 1), num_adapt=0,
            num_samples=ndraws, verbose=False,
            init_steps=max(1, int(round(float(res.trajectory_length) / float(res.eps)))),
        )
        # num_adapt=0 keeps T at init_steps*eps == res's adapted T
        jax.block_until_ready(res2.thetas)
        dt = time.perf_counter() - t0

        ess, worst, rhat, st = stats_of(spec, res2.thetas)
        total = nchains * ndraws
        acc = float(np.mean(np.asarray(res2.accept)))
        print(
            f"[chees/{nchains}ch] {total} draws in {dt:.1f}s ({total/dt:.1f} draws/s), "
            f"~{res.n_leapfrog} lf/draw, accept {acc:.3f}, "
            f"min-ESS {ess:.0f} @ {worst} ({ess/dt:.2f} ESS/s), max rhat {rhat:.4f} "
            f"[adapt phase {t_adapt:.0f}s, T={float(res.trajectory_length):.3g}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
