"""Jitter-floor ablation for warm-started ChEES on the flagship joint fit.

Sampling jitters trajectory lengths u·T with u ~ halton[floor, 1].  floor=0
(the paper default) spends draws on near-zero trajectories; a floor trades
higher mean cost for (potentially superlinear) ESS/draw gains.  64 chains,
adapted T reused from r3_chees_widechain2 (T=10.9 at eps=0.1592 -> 68 steps).
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
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
SEED = 3281922803 % (2**31)
INIT_STEPS = 68  # round(T/eps) from the 150-iteration ChEES adaptation
NCHAINS = 64
NDRAWS = 300


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
    dev = jax.devices()[0]
    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm = jax.device_put(tile_warm(load_warmup(WARMUP16), NCHAINS // 16), dev)

    # shared decorrelation run (floor 0)
    pre = run_chees_from_warmup(
        potential, warm, jax.random.PRNGKey(SEED + 3), num_adapt=0,
        num_samples=25, init_steps=INIT_STEPS,
    )
    jax.block_until_ready(pre.thetas)

    for floor in (0.0, 0.4, 0.7, 1.0):
        cfg = CheesConfig(max_leapfrogs=96, jitter_floor=floor)
        t0 = time.perf_counter()
        res = run_chees_from_warmup(
            potential, pre.warm, jax.random.PRNGKey(SEED + int(100 * floor)),
            num_adapt=0, num_samples=NDRAWS, cfg=cfg, init_steps=INIT_STEPS,
        )
        jax.block_until_ready(res.thetas)
        dt = time.perf_counter() - t0
        ess, worst, rhat = stats_of(spec, res.thetas)
        total = NCHAINS * NDRAWS
        acc = float(np.mean(np.asarray(res.accept)))
        print(
            f"[floor={floor:.1f}] {total} draws in {dt:.1f}s ({total / dt:.1f} draws/s), "
            f"~{res.n_leapfrog} lf/draw, accept {acc:.3f}, min-ESS {ess:.0f} @ {worst} "
            f"({ess / dt:.2f} ESS/s, {ess / total:.3f} ESS/draw), max rhat {rhat:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
