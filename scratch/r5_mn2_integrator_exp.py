"""MN2 (2-stage minimal-norm) integrator vs leapfrog for the 64-chain hybrid.

Same committed warmup16 kernels and ChEES trajectory length T=9.38 (today's
re-measure, scratch/r5_refined_mass_exp.log); only the symplectic integrator
changes.  MN2 (Blanes-Casas-Sanz-Serna lambda=0.193...) takes 2 gradient evals
per step but its smaller error constant allows a ~2-3x larger stable step at
the same acceptance, so gradients per unit trajectory can drop ~1.3-1.5x.

Protocol:
  1. DA-adapt eps_mn2 at fixed T with jittered lengths (100 iterations, 64ch).
  2. 300-draw 64-chain sampling phase, direct min-ESS/s.
  3. Compare vs today's leapfrog hybrid baseline: 86.3 ESS/s (accept 0.69,
     eps=0.159, ~59 lf/draw).
"""
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.benchdata import flagship_pop_cosmo_data
from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec
from bumpcosmology_tpu.inference.model import constrain, make_potential
from bumpcosmology_tpu.inference.nuts import (
    NutsConfig,
    _da_init,
    _da_update,
    _kinetic,
)
from bumpcosmology_tpu.inference.chees import _halton, _sample_momentum
from bumpcosmology_tpu.ops.interp import set_default_method
from bumpcosmology_tpu.utils.checkpoint import load_warmup
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

CATALOG = "/root/repo/benchmarks/flagship_catalog.npz"
WARMUP16 = "/root/repo/benchmarks/flagship_warmup16.npz"
SEED = 20260820
T_TRAJ = 9.38
LAMBDA = 0.19318332750378357


def mn2_trajectory(value_and_grad, theta, p, u, grad, eps, cov, n_steps):
    """n_steps MN2 steps; returns (theta, p, u, grad) at the endpoint.

    Position-first scheme: per step 2 gradient evals; the endpoint potential
    (and gradient, for the persistent state) is refreshed once at the end.
    """

    def body(i, c):
        theta, p = c
        theta = theta + (LAMBDA * eps) * (cov @ p)
        _, g1 = value_and_grad(theta)
        p = p - (0.5 * eps) * g1
        theta = theta + ((1.0 - 2.0 * LAMBDA) * eps) * (cov @ p)
        _, g2 = value_and_grad(theta)
        p = p - (0.5 * eps) * g2
        theta = theta + (LAMBDA * eps) * (cov @ p)
        return (theta, p)

    theta, p = jax.lax.fori_loop(0, n_steps, body, (theta, p))
    u_new, grad_new = value_and_grad(theta)
    return theta, p, u_new.astype(theta.dtype), grad_new.astype(theta.dtype)


def hmc_step_mn2(value_and_grad, state_theta, state_u, state_grad, eps, n_steps, cov, chol, key):
    dim = state_theta.shape[0]
    dtype = state_theta.dtype
    k_mom, k_acc = jax.random.split(key)
    p0 = _sample_momentum(k_mom, chol, dim, dtype)
    h0 = state_u + _kinetic(p0, cov)
    theta, p, u, grad = mn2_trajectory(
        value_and_grad, state_theta, p0, state_u, state_grad, eps, cov, n_steps
    )
    h1 = u + _kinetic(p, cov)
    h1 = jnp.where(jnp.isnan(h1), jnp.inf, h1)
    accept_prob = jnp.exp(jnp.minimum(h0 - h1, 0.0))
    take = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
    return (
        jnp.where(take, theta, state_theta),
        jnp.where(take, u, state_u),
        jnp.where(take, grad, state_grad),
        accept_prob,
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
    vag = jax.value_and_grad(potential)
    warm16 = jax.device_put(load_warmup(WARMUP16), dev)

    # 64 chains: tile the 16 adapted kernels
    tile = lambda x: jnp.asarray(np.tile(np.asarray(x), (4,) + (1,) * (np.ndim(x) - 1)))
    theta = jax.device_put(tile(warm16.state.theta), dev)
    nch, dim = theta.shape
    dtype = theta.dtype
    cov = jax.device_put(jnp.asarray(np.asarray(warm16.cov)[0]), dev)  # shared kernel
    chol = jax.device_put(jnp.asarray(np.asarray(warm16.chol_cov)[0]), dev)
    u0, g0 = jax.vmap(vag)(theta)
    u0 = u0.astype(dtype)
    g0 = g0.astype(dtype)

    cfg = NutsConfig()  # DA constants + target_accept

    @jax.jit
    def da_chunk(theta, u, g, da, key, n_steps_arr):
        def step(carry, inp):
            theta, u, g, da = carry
            k, ns = inp
            ks = jax.random.split(k, nch)
            eps = jnp.exp(da.log_eps)
            theta, u, g, acc = jax.vmap(
                lambda t, uu, gg, kk: hmc_step_mn2(vag, t, uu, gg, eps, ns, cov, chol, kk)
            )(theta, u, g, ks)
            da = _da_update(da, jnp.mean(acc), cfg)
            return (theta, u, g, da), jnp.mean(acc)

        keys = jax.random.split(key, n_steps_arr.shape[0])
        (theta, u, g, da), accs = jax.lax.scan(step, (theta, u, g, da), (keys, n_steps_arr))
        return theta, u, g, da, accs

    # --- eps adaptation at fixed T (jittered lengths) ----------------------
    eps0 = float(np.asarray(warm16.eps)[0]) * 2.0
    da = _da_init(jnp.asarray(eps0, dtype), dtype)
    key = jax.random.PRNGKey(SEED)
    t0 = time.perf_counter()
    it = 0
    for chunk in range(10):
        eps_now = float(jnp.exp(da.log_eps))
        ns = jnp.asarray(
            [max(1, min(96, math.ceil(_halton(it + i) * T_TRAJ / eps_now))) for i in range(10)],
            jnp.int32,
        )
        key, k = jax.random.split(key)
        theta, u0, g0, da, accs = da_chunk(theta, u0, g0, da, k, ns)
        jax.block_until_ready(theta)
        it += 10
        if (chunk + 1) % 5 == 0:
            print(f"[mn2/adapt] {it}/100 eps={eps_now:.4g} accept={float(jnp.mean(accs)):.3f}",
                  flush=True)
    eps = float(jnp.exp(da.log_eps_bar))
    n_mean = max(1, math.ceil(0.5 * T_TRAJ / eps))
    print(f"[mn2] adapted eps={eps:.4g} (leapfrog was 0.159) -> ~{n_mean} steps "
          f"= ~{2*n_mean+1} grads/draw (leapfrog: ~59) in {time.perf_counter()-t0:.0f}s",
          flush=True)

    # --- sampling phase -----------------------------------------------------
    @jax.jit
    def sample_chunk(theta, u, g, key, n_steps_arr):
        def step(carry, inp):
            theta, u, g = carry
            k, ns = inp
            ks = jax.random.split(k, nch)
            theta, u, g, acc = jax.vmap(
                lambda t, uu, gg, kk: hmc_step_mn2(
                    vag, t, uu, gg, jnp.asarray(eps, dtype), ns, cov, chol, kk
                )
            )(theta, u, g, ks)
            return (theta, u, g), (theta, jnp.mean(acc))

        keys = jax.random.split(key, n_steps_arr.shape[0])
        (theta, u, g), (ths, accs) = jax.lax.scan(step, (theta, u, g), (keys, n_steps_arr))
        return theta, u, g, ths, accs

    def steps_arr(i0, n):
        return jnp.asarray(
            [max(1, min(96, math.ceil(_halton(i0 + i) * T_TRAJ / eps))) for i in range(n)],
            jnp.int32,
        )

    # decorrelate + compile
    key, k = jax.random.split(key)
    theta, u0, g0, _, _ = sample_chunk(theta, u0, g0, k, steps_arr(0, 25))
    jax.block_until_ready(theta)

    chunks = []
    accs_all = []
    done, it2 = 0, 25
    t0 = time.perf_counter()
    while done < 300:
        n = min(25, 300 - done)
        key, k = jax.random.split(key)
        theta, u0, g0, ths, accs = sample_chunk(theta, u0, g0, k, steps_arr(it2, n))
        chunks.append(ths)
        accs_all.append(accs)
        done += n
        it2 += n
    jax.block_until_ready(chunks[-1])
    dt = time.perf_counter() - t0
    thetas = jnp.swapaxes(jnp.concatenate(chunks, axis=0), 0, 1)  # (chains, draws, dim)
    sites = {k2: np.asarray(v) for k2, v in constrain(spec, thetas).items()}
    st = summary({k2: v for k2, v in sites.items() if np.ndim(v) == 2})
    worst = min(st.items(), key=lambda kv: kv[1]["ess"])
    acc = float(jnp.mean(jnp.concatenate(accs_all)))
    print(
        f"[mn2/hyb64] 19200 draws in {dt:.1f}s ({19200/dt:.0f} draws/s), accept {acc:.2f}, "
        f"min-ESS {worst[1]['ess']:.0f} @ {worst[0]} ({worst[1]['ess']/dt:.2f} ESS/s), "
        f"max rhat {max(s['rhat'] for s in st.values()):.4f}  "
        f"[leapfrog baseline today: 86.3 ESS/s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
