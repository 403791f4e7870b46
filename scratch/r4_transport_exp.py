"""ESS/grad experiment: better mass + Gaussianizing transport vs committed kernel.

Configs (all 64 chains, jittered fixed-length HMC, eps via dual averaging +
T via ChEES at FIXED mass):
  A  committed warmup16 kernel (baseline; bench measured 68.8 ESS/s)
  B  dense mass = covariance of the 4000-draw f64 golden trace
  C  B + elementwise sinh-arcsinh Gaussianization in whitened space
     (exact reparameterization -- any fixed bijection preserves the target)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.chees import (
    CheesConfig,
    _AdamState,
    _chees_iteration,
    _chees_sample_chunk,
    _halton,
)
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential, unconstrain
from bumpcosmology_tpu.inference.nuts import ChainState, _da_init, _batched_welford_init
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
GOLDEN = "/root/repo/benchmarks/golden_joint_f64.npz"
NCH = 64
N_ADAPT = 200
N_DRAWS = 300
SEED = 20260819


def golden_unconstrained(spec):
    d = np.load(GOLDEN, allow_pickle=True)
    names = [k[5:] for k in d.files if k.startswith("post_")]
    flat = {n: jnp.asarray(d["post_" + n].reshape(-1), jnp.float32) for n in names}
    n = flat[names[0]].shape[0]
    th = jax.vmap(lambda i: unconstrain(spec, {k: v[i] for k, v in flat.items()}))(
        jnp.arange(n)
    )
    return np.asarray(th, np.float64)  # (4000, dim)


def fit_sinh_arcsinh(w):
    """Per-column ML fit of u = sinh(delta*asinh(w) - eps) ~ N(0,1).

    Returns (eps, delta) arrays.  Plain Adam on the exact NLL gradient (jax
    cpu), 400 steps -- w is (n, dim) whitened draws."""
    cpu = jax.devices("cpu")[0]
    w = jax.device_put(jnp.asarray(w, jnp.float32), cpu)

    def nll(params, wcol):
        e, logd = params
        dlt = jnp.exp(logd)
        t = dlt * jnp.arcsinh(wcol) - e
        u = jnp.sinh(t)
        # log|du/dw| = log(delta) + log cosh t - 0.5 log1p(w^2)
        ldj = logd + jnp.log(jnp.cosh(t)) - 0.5 * jnp.log1p(wcol * wcol)
        return jnp.mean(0.5 * u * u - ldj)

    g = jax.jit(jax.grad(nll), device=cpu)
    eps_out, dlt_out = [], []
    for j in range(w.shape[1]):
        col = w[:, j]
        p = jnp.zeros(2)
        m = v = jnp.zeros(2)
        for i in range(400):
            gr = g(p, col)
            m = 0.9 * m + 0.1 * gr
            v = 0.999 * v + 0.001 * gr * gr
            p = p - 0.05 * m / (1 - 0.9 ** (i + 1)) / (
                jnp.sqrt(v / (1 - 0.999 ** (i + 1))) + 1e-8
            )
        e, logd = np.asarray(p)
        eps_out.append(e)
        dlt_out.append(np.exp(logd))
    return np.asarray(eps_out, np.float32), np.asarray(dlt_out, np.float32)


def make_transport(mu, L, sa_eps, sa_dlt):
    """theta = mu + L @ sinh((asinh(u) + eps)/delta); returns fwd(u)->theta and
    log|det d theta/d u| (without the constant log|det L|)."""
    mu = jnp.asarray(mu)
    L = jnp.asarray(L)
    e = jnp.asarray(sa_eps)
    d = jnp.asarray(sa_dlt)

    def fwd(u):
        t = (jnp.arcsinh(u) + e) / d
        w = jnp.sinh(t)
        ldj = jnp.sum(jnp.log(jnp.cosh(t)) - jnp.log(d) - 0.5 * jnp.log1p(u * u))
        return mu + L @ w, ldj

    def inv(theta):
        w = jax.scipy.linalg.solve_triangular(L, theta - mu, lower=True)
        return jnp.sinh(d * jnp.arcsinh(w) - e)

    return fwd, inv


def run_config(name, potential_u, u0, eps0, key, spec, map_back):
    dim = u0.shape[1]
    dtype = u0.dtype
    vag = jax.vmap(jax.value_and_grad(potential_u))
    uu, gg = vag(u0)
    state = ChainState(theta=u0, u=uu, grad=gg)
    cov = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (1, dim, dim))
    chol = cov
    cfg = CheesConfig(max_leapfrogs=256)
    cfg_tuple = (
        cfg.target_accept, cfg.adam_lr, cfg.adam_b1, cfg.adam_b2,
        cfg.da_gamma, cfg.da_t0, cfg.da_kappa,
    )
    da = _da_init(jnp.asarray(eps0, dtype), dtype)
    adam = _AdamState(
        log_t=jnp.log(jnp.asarray(16.0 * eps0, dtype)),
        m=jnp.asarray(0.0, dtype), v=jnp.asarray(0.0, dtype),
        count=jnp.asarray(0.0, dtype),
    )
    wf = _batched_welford_init(NCH, dim, dtype)
    accs = []
    for it in range(N_ADAPT):
        key, k = jax.random.split(key)
        eps = jnp.exp(da.log_eps)
        t_now = float(jnp.exp(adam.log_t))
        n_steps = jnp.asarray(
            int(np.clip(np.ceil(_halton(it) * t_now / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs)),
            jnp.int32,
        )
        state, adam, da, wf, acc = _chees_iteration(
            potential_u, state, eps, n_steps, cov, chol, adam, da, wf, k, cfg_tuple
        )
        accs.append(float(acc))
        if (it + 1) % 100 == 0:
            print(f"[{name}/adapt] {it+1}/{N_ADAPT} T={t_now:.3g} eps={float(eps):.3g} "
                  f"accept={np.mean(accs[-100:]):.3f}", flush=True)
    eps = float(jnp.exp(da.log_eps_bar))
    T = float(jnp.exp(adam.log_t))
    n_mean = int(np.clip(np.ceil(0.5 * T / eps), 1, cfg.max_leapfrogs))
    print(f"[{name}] adapted eps={eps:.4g} T={T:.4g} -> ~{n_mean} lf/draw", flush=True)

    # sample in chunks; measure wall on the recorded phase only
    def steps(i):
        return int(np.clip(np.ceil(_halton(i) * T / eps), 1, cfg.max_leapfrogs))

    # decorrelation + compile prefix
    key, k = jax.random.split(key)
    arr = jnp.asarray([steps(i) for i in range(25)], jnp.int32)
    state, _, _, _ = _chees_sample_chunk(potential_u, state, jnp.asarray(eps, dtype), arr, cov, chol, k, 25)
    jax.block_until_ready(state.theta)

    per_chunk = max(1, min(50, 32000 // (n_mean * NCH)))
    done, it2 = 0, 25
    chunks, acc_chunks = [], []
    t0 = time.perf_counter()
    while done < N_DRAWS:
        n = min(per_chunk, N_DRAWS - done)
        key, k = jax.random.split(key)
        arr = jnp.asarray([steps(it2 + i) for i in range(n)], jnp.int32)
        state, th, ac, dv = _chees_sample_chunk(
            potential_u, state, jnp.asarray(eps, dtype), arr, cov, chol, k, n
        )
        chunks.append(th)
        acc_chunks.append(ac)
        done += n
        it2 += n
    jax.block_until_ready(chunks[-1])
    dt = time.perf_counter() - t0
    us = jnp.swapaxes(jnp.concatenate(chunks, axis=0), 0, 1)  # (chains, draws, dim)
    acc = float(jnp.mean(jnp.concatenate(acc_chunks, axis=0)))
    thetas = map_back(us)
    sites = {k2: np.asarray(v) for k2, v in constrain(spec, thetas).items()}
    stats = summary({k2: v for k2, v in sites.items() if np.ndim(v) == 2})
    min_site = min(stats, key=lambda s: stats[s]["ess"])
    min_ess = stats[min_site]["ess"]
    total = NCH * N_DRAWS
    print(
        f"[{name}] {total} draws in {dt:.1f}s ({total/dt:.1f} draws/s), accept {acc:.2f}, "
        f"min-ESS {min_ess:.0f} @ {min_site} ({min_ess/dt:.2f} ESS/s), "
        f"ESS/draw {min_ess/total:.3f}, ~{n_mean} lf/draw",
        flush=True,
    )
    return min_ess / dt


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
    set_default_method(None)

    data = jax.device_put(flagship_pop_cosmo_data(CATALOG), dev)
    spec = pop_cosmo_model_spec(data)
    potential = make_potential(spec)
    warm = jax.device_put(load_warmup(WARMUP16), dev)

    th_gold = golden_unconstrained(spec)  # (4000, dim) f64 on cpu
    mu = th_gold.mean(axis=0)
    cov = np.cov(th_gold.T)
    L = np.linalg.cholesky(cov)
    wht = np.linalg.solve(L, (th_gold - mu).T).T  # whitened draws
    print(f"[setup] golden unconstrained: dim={th_gold.shape[1]}, whitened sd "
          f"{wht.std(axis=0).min():.3f}..{wht.std(axis=0).max():.3f}", flush=True)
    sa_eps, sa_dlt = fit_sinh_arcsinh(wht)
    print("[setup] sinh-arcsinh eps:", np.round(sa_eps, 3), flush=True)
    print("[setup] sinh-arcsinh dlt:", np.round(sa_dlt, 3), flush=True)

    # start positions: committed warmup16 tiled to 64 chains
    th0 = np.tile(np.asarray(warm.state.theta), (4, 1)).astype(np.float32)

    key = jax.random.PRNGKey(SEED)
    k_b, k_c = jax.random.split(key)

    # --- B: golden mass, linear transport only ---------------------------
    mu32 = jnp.asarray(mu, jnp.float32)
    L32 = jnp.asarray(L, jnp.float32)

    def fwd_lin(u):
        return mu32 + L32 @ u, jnp.asarray(0.0, jnp.float32)

    def pot_b(u):
        th, _ = fwd_lin(u)
        return potential(th)

    u0_b = jax.device_put(
        jnp.asarray(np.linalg.solve(L, (th0 - mu).T).T, jnp.float32), dev
    )
    run_config(
        "B:golden-mass", pot_b, u0_b, 0.3, k_b, spec,
        lambda us: jax.vmap(jax.vmap(lambda u: fwd_lin(u)[0]))(us),
    )

    # --- C: golden mass + sinh-arcsinh transport --------------------------
    fwd, inv = make_transport(mu32, L32, sa_eps, sa_dlt)

    def pot_c(u):
        th, ldj = fwd(u)
        return potential(th) - ldj

    u0_c = jax.device_put(jax.vmap(inv)(jnp.asarray(th0, jnp.float32)), dev)
    run_config(
        "C:transport", pot_c, u0_c, 0.3, k_c, spec,
        lambda us: jax.vmap(jax.vmap(lambda u: fwd(u)[0]))(us),
    )


if __name__ == "__main__":
    main()
