"""Arm C of the refined-mass experiment: oracle golden covariance.

Chunked eps re-adaptation (10-step programs, depth cap 6) to stay under the
remote-TPU per-program execution deadline that killed the first attempt.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.chees import run_chees_from_warmup
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential, unconstrain
from bumpcosmology_tpu.inference.nuts import (
    NutsConfig,
    WarmupResult,
    _da_init,
    _da_update,
    nuts_transition,
    run_sampling,
)
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
GOLDEN = "/root/repo/benchmarks/golden_joint_f64.npz"
SEED = 20260819


def golden_cov(spec):
    d = np.load(GOLDEN, allow_pickle=True)
    names = [k[5:] for k in d.files if k.startswith("post_")]
    flat = {n: jnp.asarray(d["post_" + n].reshape(-1), jnp.float32) for n in names}
    n = flat[names[0]].shape[0]
    th = jax.vmap(lambda i: unconstrain(spec, {k: v[i] for k, v in flat.items()}))(
        jnp.arange(n)
    )
    return np.cov(np.asarray(th, np.float64).T)


def eps_readapt_chunked(potential, state, cov, chol, eps0, key, n_steps=100, chunk=10):
    nchains = state.theta.shape[0]
    dtype = state.theta.dtype
    cfg = NutsConfig()
    da = jax.vmap(lambda e: _da_init(e, dtype))(jnp.asarray(eps0, dtype))

    @jax.jit
    def run(state, da, key):
        def step(carry, k):
            state, da = carry
            ks = jax.random.split(k, nchains)
            eps = jnp.exp(da.log_eps)
            state, stats = jax.vmap(
                lambda s, e, c, ch, kk: nuts_transition(potential, s, e, c, ch, kk, 6)
            )(state, eps, cov, chol, ks)
            da = jax.vmap(lambda d, a: _da_update(d, a, cfg))(da, stats.accept_prob)
            return (state, da), stats.accept_prob

        (state, da), acc = jax.lax.scan(step, (state, da), jax.random.split(key, chunk))
        return state, da, acc

    accs = []
    for i in range(n_steps // chunk):
        key, k = jax.random.split(key)
        state, da, acc = run(state, da, k)
        jax.block_until_ready(state.theta)
        accs.append(np.asarray(acc))
    return state, jnp.exp(da.log_eps_bar), float(np.mean(accs[-3:]))


def measure(name, spec, potential, warm, key, dev):
    cfg = NutsConfig()
    _, _, warm2 = run_sampling(potential, warm, key, 25, cfg)
    jax.block_until_ready(warm2.state.theta)
    t0 = time.perf_counter()
    thetas, stats, _ = run_sampling(potential, warm2, jax.random.split(key)[0], 400, cfg)
    jax.block_until_ready(thetas)
    dt = time.perf_counter() - t0
    sites = {k: np.asarray(v) for k, v in constrain(spec, thetas).items()}
    st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    worst = min(st.items(), key=lambda kv: kv[1]["ess"])
    depth = float(np.median(np.asarray(stats.tree_depth)))
    nlf = float(np.mean(np.asarray(stats.n_leapfrog)))
    print(
        f"[{name}/nuts16] 6400 draws in {dt:.1f}s, min-ESS {worst[1]['ess']:.0f} @ "
        f"{worst[0]} ({worst[1]['ess']/dt:.2f} ESS/s), med depth {depth:.0f}, "
        f"mean lf {nlf:.1f}, max rhat {max(s['rhat'] for s in st.values()):.4f}",
        flush=True,
    )

    t0 = time.perf_counter()
    res = run_chees_from_warmup(
        potential, warm2, jax.random.PRNGKey(SEED + 5), num_adapt=150, num_samples=0,
    )
    t_adapt = time.perf_counter() - t0
    T = float(res.trajectory_length)
    eps_c = float(np.asarray(warm2.eps)[0])
    init_steps = max(1, int(round(T / eps_c)))
    print(f"[{name}/chees] T={T:.3g} eps={eps_c:.3g} -> ~{init_steps} lf/draw "
          f"(adapt {t_adapt:.0f}s)", flush=True)

    warm64 = jax.device_put(
        jax.tree.map(lambda x: np.tile(np.asarray(x), (4,) + (1,) * (np.ndim(x) - 1)), warm2),
        dev,
    )
    pre = run_chees_from_warmup(
        potential, warm64, jax.random.PRNGKey(SEED + 6), num_adapt=0, num_samples=25,
        init_steps=init_steps,
    )
    jax.block_until_ready(pre.thetas)
    t0 = time.perf_counter()
    res2 = run_chees_from_warmup(
        potential, pre.warm, jax.random.PRNGKey(SEED + 7), num_adapt=0, num_samples=300,
        init_steps=init_steps,
    )
    jax.block_until_ready(res2.thetas)
    dt = time.perf_counter() - t0
    sites = {k: np.asarray(v) for k, v in constrain(spec, res2.thetas).items()}
    st = summary({k: v for k, v in sites.items() if np.ndim(v) == 2})
    worst = min(st.items(), key=lambda kv: kv[1]["ess"])
    acc = float(np.mean(np.asarray(res2.accept)))
    print(
        f"[{name}/hyb64] 19200 draws in {dt:.1f}s ({19200/dt:.0f} draws/s), accept "
        f"{acc:.2f}, min-ESS {worst[1]['ess']:.0f} @ {worst[0]} "
        f"({worst[1]['ess']/dt:.2f} ESS/s), max rhat {max(s['rhat'] for s in st.values()):.4f}",
        flush=True,
    )


def main():
    enable_compilation_cache()
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
    set_default_method(None)

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm16 = jax.device_put(load_warmup(WARMUP16), dev)

    c_gold = golden_cov(spec)
    dim = c_gold.shape[0]
    nch = warm16.state.theta.shape[0]
    cov = jnp.broadcast_to(jnp.asarray(c_gold, jnp.float32), (nch, dim, dim))
    chol = jnp.broadcast_to(
        jnp.asarray(np.linalg.cholesky(c_gold), jnp.float32), (nch, dim, dim)
    )
    t0 = time.perf_counter()
    state2, eps, acc = eps_readapt_chunked(
        potential, warm16.state, cov, chol, np.asarray(warm16.eps) * 2.0,
        jax.random.PRNGKey(SEED + 4),
    )
    print(f"[C:golden] eps re-adapted in {time.perf_counter()-t0:.0f}s: "
          f"{np.asarray(eps).round(3)} (accept {acc:.2f})", flush=True)
    warm_c = WarmupResult(state=state2, eps=eps, cov=cov, chol_cov=chol)
    measure("C:golden", spec, potential, warm_c, jax.random.PRNGKey(SEED + 8), dev)


if __name__ == "__main__":
    main()
