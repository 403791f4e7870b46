"""ChEES-HMC: jittered fixed-length HMC with cross-chain trajectory adaptation.

A TPU-optimized alternative to NUTS (Hoffman, Radul & Sountsov 2021,
"An Adaptive-MCMC Scheme for Setting Trajectory Lengths in Hamiltonian Monte
Carlo").  Where NUTS builds per-chain variable-depth trees — which under
``vmap`` run in lockstep at the *deepest* chain's cost — ChEES-HMC runs every
chain for the same jittered number of leapfrog steps each iteration and
adapts the trajectory length T by stochastic gradient ascent on the
Change-in-the-Estimator-of-the-Expected-Square criterion

    ChEES = E[ ( ||θ' − E θ'||² − ||θ − E θ||² )² ] / 4,

whose gradient is estimated *across the vectorized chain batch* — exactly the
regime (tens to hundreds of chains per chip) this framework targets.

Shared across chains: step size (dual averaging on the mean accept
probability), trajectory length, and the dense mass matrix (pooled Welford,
as in ``NutsConfig.shared_mass``).  Per iteration the leapfrog count is
``ceil(u_k · T / eps)`` with ``u_k`` a Halton-sequence jitter shared by all
chains, so one compiled program serves every iteration via a
``fori_loop`` with a traced bound.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference.nuts import (
    ChainState,
    WarmupResult,
    _batched_welford_init,
    _da_init,
    _da_update,
    _init_chain_state,
    _kinetic,
    _leapfrog,
    _pool_welford,
    _sample_momentum,
    _welford_cov,
    _welford_update,
    warmup_schedule,
)

__all__ = ["CheesConfig", "CheesResult", "run_chees", "run_chees_from_warmup"]


class CheesConfig(NamedTuple):
    target_accept: float = 0.75
    init_trajectory_length: float = 1.0
    # Adam-style updates on log T (paper defaults)
    adam_lr: float = 0.025
    adam_b1: float = 0.9
    adam_b2: float = 0.95
    max_leapfrogs: int = 1000
    da_gamma: float = 0.05
    da_t0: float = 10.0
    da_kappa: float = 0.75
    # sampling-phase trajectory jitter: lengths are u·T with u ~ halton over
    # [jitter_floor, 1].  A floor > 0 stops spending draws on near-zero
    # trajectories (high autocorrelation per unit cost) while keeping the
    # resonance-breaking jitter; adaptation always jitters over (0, 1] as the
    # ChEES criterion assumes.
    jitter_floor: float = 0.0


class _AdamState(NamedTuple):
    log_t: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray
    count: jnp.ndarray


def _halton(i: int, base: int = 2) -> float:
    """i-th element of the base-2 Halton sequence in (0, 1)."""
    f, r = 1.0, 0.0
    i = int(i) + 1
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def _hmc_step(value_and_grad, state: ChainState, eps, n_steps, cov, chol, key):
    """One fixed-length HMC proposal for a single chain; returns the new state,
    the accept probability, a divergence flag (energy error > 1000 nats, the
    same threshold as NUTS ``max_delta_energy``), and (θ', p') for the ChEES
    gradient."""
    dim = state.theta.shape[0]
    dtype = state.theta.dtype
    k_mom, k_acc = jax.random.split(key)
    p0 = _sample_momentum(k_mom, chol, dim, dtype)
    h0 = state.u + _kinetic(p0, cov)

    theta, p, u, grad = jax.lax.fori_loop(
        0,
        n_steps,
        lambda i, c: _leapfrog(value_and_grad, c[0], c[1], c[3], eps, cov),
        (state.theta, p0, state.u, state.grad),
    )
    h1 = u + _kinetic(p, cov)
    h1 = jnp.where(jnp.isnan(h1), jnp.inf, h1)
    accept_prob = jnp.exp(jnp.minimum(h0 - h1, 0.0))
    diverging = (h1 - h0) > 1000.0
    take = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
    new = ChainState(
        theta=jnp.where(take, theta, state.theta),
        u=jnp.where(take, u, state.u),
        grad=jnp.where(take, grad, state.grad),
    )
    return new, accept_prob, diverging, theta, p


@partial(jax.jit, static_argnames=("potential_fn",))
def _chees_iteration(potential_fn, state, eps, n_steps, cov, chol, adam, da, wf, key, cfg_tuple):
    """One adaptation iteration: batched HMC step + ChEES log-T update +
    dual-averaging eps update + Welford update."""
    (target_accept, lr, b1, b2, da_gamma, da_t0, da_kappa) = cfg_tuple
    nchains = state.theta.shape[0]
    vag = jax.value_and_grad(potential_fn)
    keys = jax.random.split(key, nchains)

    new_state, accept, _, theta_prop, p_prop = jax.vmap(
        lambda s, k: _hmc_step(vag, s, eps, n_steps, cov[0], chol[0], k)
    )(state, keys)

    # --- ChEES gradient estimate over the chain batch (paper eq. 14) ------
    mean_old = jnp.mean(state.theta, axis=0)
    mean_prop = jnp.mean(theta_prop, axis=0)
    d_old = state.theta - mean_old
    d_prop = theta_prop - mean_prop
    delta = jnp.sum(d_prop * d_prop, axis=1) - jnp.sum(d_old * d_old, axis=1)
    proj = jnp.sum(d_prop * p_prop, axis=1)
    w = accept / jnp.maximum(jnp.sum(accept), 1e-6)
    grad_t = jnp.sum(w * delta * proj)

    # --- Adam on log T ----------------------------------------------------
    count = adam.count + 1.0
    m = b1 * adam.m + (1 - b1) * grad_t
    v = b2 * adam.v + (1 - b2) * grad_t * grad_t
    m_hat = m / (1 - b1**count)
    v_hat = v / (1 - b2**count)
    log_t = adam.log_t + lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
    new_adam = _AdamState(log_t=log_t, m=m, v=v, count=count)

    # --- shared dual averaging on the mean accept --------------------------
    from bumpcosmology_tpu.inference.nuts import NutsConfig

    da_cfg = NutsConfig(target_accept=target_accept, da_gamma=da_gamma, da_t0=da_t0, da_kappa=da_kappa)
    new_da = _da_update(da, jnp.mean(accept), da_cfg)

    wf = jax.vmap(_welford_update)(wf, new_state.theta)
    return new_state, new_adam, new_da, wf, jnp.mean(accept)


@partial(jax.jit, static_argnames=("potential_fn", "n_iters"))
def _chees_sample_chunk(potential_fn, state, eps, n_steps_arr, cov, chol, key, n_iters: int):
    """``n_iters`` HMC iterations; ``n_steps_arr`` (n_iters,) int32 gives each
    iteration's leapfrog count (the sampling-phase trajectory jitter — kept
    per the ChEES paper to break resonances; a scanned input, so one compiled
    program serves every jitter value)."""
    nchains = state.theta.shape[0]
    vag = jax.value_and_grad(potential_fn)

    def step(state, xs):
        step_key, n_steps = xs
        keys = jax.random.split(step_key, nchains)
        new_state, accept, div, _, _ = jax.vmap(
            lambda s, k: _hmc_step(vag, s, eps, n_steps, cov[0], chol[0], k)
        )(state, keys)
        return new_state, (new_state.theta, accept, div)

    state, (thetas, accepts, divs) = jax.lax.scan(
        step, state, (jax.random.split(key, n_iters), n_steps_arr)
    )
    return state, thetas, accepts, divs


class CheesResult(NamedTuple):
    thetas: jnp.ndarray  # (chains, draws, dim)
    accept: jnp.ndarray  # (chains, draws)
    eps: jnp.ndarray
    trajectory_length: jnp.ndarray
    n_leapfrog: int
    warm: WarmupResult
    diverging: jnp.ndarray = np.zeros((0, 0), dtype=bool)  # (chains, draws)


@partial(jax.jit, static_argnames=("potential_fn",))
def _t_adapt_iteration(potential_fn, state, eps, n_steps, cov, chol, adam, key, adam_hp):
    """One trajectory-length adaptation iteration at FIXED (eps, mass):
    batched jittered HMC step + ChEES Adam update on log T."""
    lr, b1, b2 = adam_hp
    nchains = state.theta.shape[0]
    vag = jax.value_and_grad(potential_fn)
    keys = jax.random.split(key, nchains)

    new_state, accept, _, theta_prop, p_prop = jax.vmap(
        lambda s, k: _hmc_step(vag, s, eps, n_steps, cov[0], chol[0], k)
    )(state, keys)

    mean_old = jnp.mean(state.theta, axis=0)
    mean_prop = jnp.mean(theta_prop, axis=0)
    d_old = state.theta - mean_old
    d_prop = theta_prop - mean_prop
    delta = jnp.sum(d_prop * d_prop, axis=1) - jnp.sum(d_old * d_old, axis=1)
    proj = jnp.sum(d_prop * p_prop, axis=1)
    w = accept / jnp.maximum(jnp.sum(accept), 1e-6)
    grad_t = jnp.sum(w * delta * proj)

    count = adam.count + 1.0
    m = b1 * adam.m + (1 - b1) * grad_t
    v = b2 * adam.v + (1 - b2) * grad_t * grad_t
    m_hat = m / (1 - b1**count)
    v_hat = v / (1 - b2**count)
    log_t = adam.log_t + lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
    new_adam = _AdamState(log_t=log_t, m=m, v=v, count=count)
    return new_state, new_adam, jnp.mean(accept)


def run_chees_from_warmup(
    potential_fn: Callable,
    warm: WarmupResult,
    key: jnp.ndarray,
    num_adapt: int = 150,
    num_samples: int = 500,
    cfg: CheesConfig = CheesConfig(max_leapfrogs=96),
    init_steps: int = 16,
    verbose: bool = False,
) -> CheesResult:
    """ChEES sampling from a NUTS-adapted state (the production TPU config).

    Vectorized NUTS pays a ragged-tree tax: under ``vmap`` every lockstep
    batch runs at the *deepest* chain's trajectory cost, so total draw
    throughput FALLS as chains are added (measured 82.6 → 70.4 → 53.1
    draws/s at 4/16/64 chains on the flagship joint fit).  Fixed-length
    jittered HMC vectorizes perfectly; what it needs — a step size, a dense
    mass matrix, converged positions — the NUTS windowed warmup already
    produced.  So: keep ``warm``'s (eps, mass) fixed, adapt ONLY the
    trajectory length T by the ChEES criterion for ``num_adapt`` iterations
    (initialized at ``init_steps``·eps, capped at ``cfg.max_leapfrogs``
    leapfrogs — the cap also bounds the cost of any Adam overshoot), then
    draw ``num_samples`` with Halton-jittered lengths.

    ``warm.eps``/``warm.cov`` may be per-chain (NUTS adapts per chain);
    chain 0's kernel is shared across the batch, as in :func:`run_chees`.
    """
    nchains, dim = warm.state.theta.shape
    dtype = warm.state.theta.dtype
    state = warm.state
    eps = jnp.asarray(warm.eps)[0] if jnp.ndim(warm.eps) else jnp.asarray(warm.eps)
    cov = jnp.broadcast_to(warm.cov[0], (1, dim, dim))
    chol = jnp.broadcast_to(warm.chol_cov[0], (1, dim, dim))

    adam = _AdamState(
        log_t=jnp.log(jnp.asarray(float(init_steps) * float(eps), dtype)),
        m=jnp.asarray(0.0, dtype),
        v=jnp.asarray(0.0, dtype),
        count=jnp.asarray(0.0, dtype),
    )
    adam_hp = (cfg.adam_lr, cfg.adam_b1, cfg.adam_b2)

    accs = []
    for it in range(num_adapt):
        key, k = jax.random.split(key)
        t_now = float(jnp.exp(adam.log_t))
        n_steps = jnp.asarray(
            int(np.clip(math.ceil(_halton(it) * t_now / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs)),
            jnp.int32,
        )
        state, adam, acc = _t_adapt_iteration(
            potential_fn, state, eps, n_steps, cov, chol, adam, k, adam_hp
        )
        accs.append(float(acc))
        if verbose and (it + 1) % 50 == 0:
            print(
                f"[chees/adapt] {it + 1}/{num_adapt} T={t_now:.3g} "
                f"accept={np.mean(accs[-50:]):.3f}"
            )

    t_final = float(jnp.exp(adam.log_t))
    floor = float(cfg.jitter_floor)

    def jitter_steps(i):
        u = floor + (1.0 - floor) * _halton(i)
        return int(np.clip(math.ceil(u * t_final / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs))

    n_steps_mean = int(
        np.clip(math.ceil(0.5 * (1.0 + floor) * t_final / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs)
    )
    if verbose:
        print(f"[chees] T={t_final:.4g} eps={float(eps):.4g} -> ~{n_steps_mean} leapfrogs/draw (jittered)")

    thetas_chunks, accept_chunks, div_chunks = [], [], []
    done = 0
    it = num_adapt
    # per-execution budget in leapfrog·chains: remote-TPU executions are
    # deadline-limited (~60s on the tunnel); 32k lf·chains ≈ 5s on v5e at
    # the flagship catalog, and wide chain batches scale the eval linearly
    iters_per_chunk = max(
        1, min(50, 32000 // (max(n_steps_mean, 1) * max(nchains, 1)))
    )
    while done < num_samples:
        n = min(iters_per_chunk, num_samples - done)
        key, k = jax.random.split(key)
        steps_arr = jnp.asarray([jitter_steps(it + i) for i in range(n)], jnp.int32)
        state, thetas, accepts, divs = _chees_sample_chunk(
            potential_fn, state, eps, steps_arr, cov, chol, k, n
        )
        thetas_chunks.append(thetas)
        accept_chunks.append(accepts)
        div_chunks.append(divs)
        done += n
        it += n

    if thetas_chunks:
        thetas = jnp.swapaxes(jnp.concatenate(thetas_chunks, axis=0), 0, 1)
        accepts = jnp.swapaxes(jnp.concatenate(accept_chunks, axis=0), 0, 1)
        divs = jnp.swapaxes(jnp.concatenate(div_chunks, axis=0), 0, 1)
    else:  # num_samples=0: adapt-only call (e.g. to measure T)
        thetas = jnp.zeros((nchains, 0, dim), dtype)
        accepts = jnp.zeros((nchains, 0), dtype)
        divs = jnp.zeros((nchains, 0), bool)
    out_warm = WarmupResult(
        state=state,
        eps=jnp.full((nchains,), eps, dtype),
        cov=jnp.broadcast_to(cov[0], (nchains, dim, dim)),
        chol_cov=jnp.broadcast_to(chol[0], (nchains, dim, dim)),
    )
    return CheesResult(
        thetas=thetas,
        accept=accepts,
        eps=eps,
        trajectory_length=jnp.asarray(t_final),
        n_leapfrog=n_steps_mean,
        warm=out_warm,
        diverging=divs,
    )


def run_chees(
    potential_fn: Callable,
    theta0: jnp.ndarray,  # (chains, dim)
    key: jnp.ndarray,
    num_warmup: int = 500,
    num_samples: int = 500,
    cfg: CheesConfig = CheesConfig(),
    verbose: bool = False,
) -> CheesResult:
    """Adaptive ChEES-HMC: shared eps/T/mass adaptation, then fixed sampling."""
    nchains, dim = theta0.shape
    dtype = theta0.dtype

    state = jax.vmap(lambda th: _init_chain_state(potential_fn, th))(theta0)
    cov = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (nchains, dim, dim))
    chol = cov
    da = _da_init(jnp.asarray(0.1, dtype), dtype)
    adam = _AdamState(
        log_t=jnp.log(jnp.asarray(cfg.init_trajectory_length, dtype)),
        m=jnp.asarray(0.0, dtype),
        v=jnp.asarray(0.0, dtype),
        count=jnp.asarray(0.0, dtype),
    )
    wf = _batched_welford_init(nchains, dim, dtype)
    cfg_tuple = (
        cfg.target_accept, cfg.adam_lr, cfg.adam_b1, cfg.adam_b2,
        cfg.da_gamma, cfg.da_t0, cfg.da_kappa,
    )

    it = 0
    for seg_len, update_mass in warmup_schedule(num_warmup):
        for _ in range(seg_len):
            key, k = jax.random.split(key)
            eps = jnp.exp(da.log_eps)
            t_now = float(jnp.exp(adam.log_t))
            jitter = _halton(it)
            n_steps = jnp.asarray(
                int(np.clip(math.ceil(jitter * t_now / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs)),
                jnp.int32,
            )
            state, adam, da, wf, acc = _chees_iteration(
                potential_fn, state, eps, n_steps, cov, chol, adam, da, wf, k, cfg_tuple
            )
            it += 1
        if update_mass:
            pooled = _pool_welford(wf)
            new_cov = jax.vmap(lambda w: _welford_cov(w))(pooled)
            new_chol = jax.vmap(jnp.linalg.cholesky)(new_cov)
            bad = bool(jnp.any(jnp.isnan(new_chol)))
            if not bad:
                cov, chol = new_cov, new_chol
            da = _da_init(jnp.exp(da.log_eps), dtype)
        wf = _batched_welford_init(nchains, dim, dtype)

    eps = jnp.exp(da.log_eps_bar)
    t_final = float(jnp.exp(adam.log_t))
    # sampling keeps the Halton trajectory jitter (paper §3: fixed lengths
    # resonate on near-Gaussian targets); mean count E[u] sizes the chunks
    floor = float(cfg.jitter_floor)

    def jitter_steps(i):
        u = floor + (1.0 - floor) * _halton(i)
        return int(np.clip(math.ceil(u * t_final / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs))

    n_steps = int(
        np.clip(math.ceil(0.5 * (1.0 + floor) * t_final / max(float(eps), 1e-6)), 1, cfg.max_leapfrogs)
    )
    if verbose:
        print(f"[chees] adapted eps={float(eps):.4g} T={t_final:.4g} -> ~{n_steps} leapfrogs/draw (jittered)")

    thetas_chunks, accept_chunks, div_chunks = [], [], []
    done = 0
    # per-execution budget in leapfrog·chains (remote-TPU executions are
    # deadline-limited; see nuts._CHUNK rationale and run_chees_from_warmup)
    iters_per_chunk = max(1, min(50, 32000 // (max(n_steps, 1) * max(nchains, 1))))
    while done < num_samples:
        n = min(iters_per_chunk, num_samples - done)
        key, k = jax.random.split(key)
        steps_arr = jnp.asarray([jitter_steps(it + i) for i in range(n)], jnp.int32)
        state, thetas, accepts, divs = _chees_sample_chunk(
            potential_fn, state, eps, steps_arr, cov, chol, k, n
        )
        thetas_chunks.append(thetas)
        accept_chunks.append(accepts)
        div_chunks.append(divs)
        done += n
        it += n

    thetas = jnp.swapaxes(jnp.concatenate(thetas_chunks, axis=0), 0, 1)
    accepts = jnp.swapaxes(jnp.concatenate(accept_chunks, axis=0), 0, 1)
    divs = jnp.swapaxes(jnp.concatenate(div_chunks, axis=0), 0, 1)
    warm = WarmupResult(state=state, eps=jnp.full((nchains,), eps, dtype), cov=cov, chol_cov=chol)
    return CheesResult(
        thetas=thetas,
        accept=accepts,
        eps=eps,
        trajectory_length=jnp.asarray(t_final),
        n_leapfrog=n_steps,
        warm=warm,
        diverging=divs,
    )
