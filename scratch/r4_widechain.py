"""Wide-chain hybrid (NUTS-warmup + ChEES fixed-length) at 64/128/256 chains
on the real chip — VERDICT r3 #5: measure whether the chain axis keeps paying
past 64, or document that it does not.

All arms run the same adapted kernels (warmup16 tiled) and the committed
trajectory length (T=10.9, eps=0.159 -> 68 leapfrogs init), identical to
bench.py's hybrid arm; ESS is measured directly from the timed draws.
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.chees import CheesConfig, run_chees_from_warmup
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
SEED = 3281922803 % (2**31)
INIT_STEPS = 68  # committed T/eps (bench.py HYBRID_INIT_STEPS)


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


def main():
    enable_compilation_cache()
    dev = jax.devices()[0]
    set_default_method(None)
    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm16 = jax.device_put(load_warmup(WARMUP16), dev)
    cfg = CheesConfig(max_leapfrogs=96)

    for nchains, ndraws in ((64, 300), (128, 300), (256, 200)):
        factor = nchains // 16
        warm = jax.device_put(tile_warm(warm16, factor), dev)
        pre = run_chees_from_warmup(
            potential, warm, jax.random.PRNGKey(SEED + nchains), num_adapt=0,
            num_samples=25, cfg=cfg, init_steps=INIT_STEPS,
        )
        jax.block_until_ready(pre.thetas)
        t0 = time.perf_counter()
        res = run_chees_from_warmup(
            potential, pre.warm, jax.random.PRNGKey(SEED + 1000 + nchains),
            num_adapt=0, num_samples=ndraws, cfg=cfg, init_steps=INIT_STEPS,
        )
        jax.block_until_ready(res.thetas)
        dt = time.perf_counter() - t0
        ess, worst, rhat = stats_of(spec, res.thetas)
        total = nchains * ndraws
        acc = float(np.mean(np.asarray(res.accept)))
        print(
            f"[hybrid/{nchains:3d}ch] {total} draws in {dt:.1f}s "
            f"({total / dt:.1f} draws/s), accept {acc:.3f}, min-ESS {ess:.0f} "
            f"@ {worst} ({ess / dt:.2f} ESS/s), max rhat {rhat:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
