"""Fleet fits: many independent single-chain NUTS fits, one compiled program.

The SBC suite needs hundreds of *small independent fits over different
datasets*.  Running them sequentially recompiles the NUTS program per dataset
(each data closure is a fresh static ``potential_fn``), which costs minutes
of XLA compilation per simulation — far more than the sampling itself.

TPU-native answer: make the dataset an *argument*, not a closure.  All
simulations share one shape, so they stack into a leading fleet axis ``S``
and every NUTS transition vmaps over paired (chain state, dataset) slices —
S fits advance in lockstep through the same Stan warmup windows inside a
single jitted chunk program that compiles ONCE.  The per-step cost is the
max tree depth over the fleet (lockstep tax), which for the small unimodal
SBC posteriors is mild; the compile amortization is ~100x.

Reuses the adaptation primitives of :mod:`bumpcosmology_tpu.inference.nuts`
(dual averaging, Welford dense mass, windowed schedule, transition kernel).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference import nuts as N
from bumpcosmology_tpu.inference.model import ModelSpec, constrain, prior_sample

__all__ = ["fleet_fit", "FleetResult"]

_CHUNK = 25


class FleetResult(NamedTuple):
    thetas: jnp.ndarray  # (S, num_samples, dim) unconstrained draws
    accept: jnp.ndarray  # (S, num_samples)
    eps: jnp.ndarray  # (S,) adapted step sizes


def _make_chunk_fns(make_pot: Callable, cfg: N.NutsConfig, n_sims: int):
    def transition(datas, state, eps, cov, chol, keys):
        return jax.vmap(
            lambda d, s, e, c, ch, k: N.nuts_transition(
                make_pot(d), s, e, c, ch, k, cfg.max_depth
            )
        )(datas, state, eps, cov, chol, keys)

    @partial(jax.jit, static_argnames=("n_steps",))
    def warmup_chunk(datas, state, cov, chol, da, wf, key, n_steps: int):
        def step(carry, step_key):
            state, da, wf = carry
            keys = jax.random.split(step_key, n_sims)
            eps = jnp.exp(da.log_eps)
            new_state, stats = transition(datas, state, eps, cov, chol, keys)
            da = jax.vmap(lambda d, a: N._da_update(d, a, cfg))(da, stats.accept_prob)
            wf = jax.vmap(N._welford_update)(wf, new_state.theta)
            return (new_state, da, wf), stats.accept_prob

        step_keys = jax.random.split(key, n_steps)
        (state, da, wf), accept = jax.lax.scan(step, (state, da, wf), step_keys)
        return state, da, wf, accept

    @partial(jax.jit, static_argnames=("n_steps",))
    def sample_chunk(datas, state, eps, cov, chol, key, n_steps: int):
        def step(state, step_key):
            keys = jax.random.split(step_key, n_sims)
            new_state, stats = transition(datas, state, eps, cov, chol, keys)
            return new_state, (new_state.theta, stats.accept_prob)

        step_keys = jax.random.split(key, n_steps)
        state, (thetas, accept) = jax.lax.scan(step, state, step_keys)
        return state, thetas, accept

    return warmup_chunk, sample_chunk


def fleet_fit(
    make_pot: Callable,
    datas,
    theta0: jnp.ndarray,
    key,
    num_warmup: int = 300,
    num_samples: int = 256,
    cfg: N.NutsConfig = N.NutsConfig(),
    progress=None,
    chunk_size: int = _CHUNK,
) -> FleetResult:
    """Run ``S`` independent single-chain NUTS fits in lockstep.

    ``make_pot(data_slice) -> potential(theta)`` builds the potential from one
    dataset slice *inside* vmap (traced, not static); ``datas`` is a pytree
    stacked on the leading fleet axis; ``theta0`` is (S, dim).

    ``chunk_size`` bounds steps per XLA execution: on deadline-limited remote
    TPUs a wide fleet in early warmup (deep lockstep trees) can exceed the
    per-execution budget at the default 25 — drop to ~5 and cap
    ``cfg.max_depth`` (~8) for big fleets.
    """
    n_sims, dim = theta0.shape
    dtype = theta0.dtype
    warmup_chunk, sample_chunk = _make_chunk_fns(make_pot, cfg, n_sims)

    k_init, k_warm, k_sample = jax.random.split(key, 3)

    def init_one(data, th, k):
        pot = make_pot(data)
        state = N._init_chain_state(pot, th)
        eye = jnp.eye(dim, dtype=dtype)
        eps = N._find_reasonable_eps(jax.value_and_grad(pot), state, eye, eye, k)
        return state, eps

    state, eps = jax.jit(jax.vmap(init_one))(
        datas, theta0, jax.random.split(k_init, n_sims)
    )
    cov = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (n_sims, dim, dim))
    chol = cov
    da = jax.vmap(lambda e: N._da_init(e, dtype))(eps)
    wf = N._batched_welford_init(n_sims, dim, dtype)

    done = 0
    for n_steps, update_mass in N.warmup_schedule(num_warmup):
        left = n_steps
        while left > 0:
            n = min(chunk_size, left)
            k_warm, k = jax.random.split(k_warm)
            state, da, wf, accept = warmup_chunk(datas, state, cov, chol, da, wf, k, n)
            left -= n
            done += n
            if progress is not None:
                jax.block_until_ready(state.theta)
                progress("warmup", done, num_warmup)
        if update_mass:
            cov, chol, da, wf = N._end_window(cov, chol, da, wf, shared_mass=False)
        else:
            wf = N._batched_welford_init(n_sims, dim, dtype)

    eps_final = jnp.exp(da.log_eps_bar)

    theta_chunks, accept_chunks = [], []
    drawn = 0
    while drawn < num_samples:
        n = min(chunk_size, num_samples - drawn)
        k_sample, k = jax.random.split(k_sample)
        state, thetas, accept = sample_chunk(datas, state, eps_final, cov, chol, k, n)
        theta_chunks.append(thetas)
        accept_chunks.append(accept)
        drawn += n
        if progress is not None:
            jax.block_until_ready(state.theta)
            progress("sampling", drawn, num_samples)

    thetas = jnp.swapaxes(jnp.concatenate(theta_chunks, axis=0), 0, 1)  # (S, T, dim)
    accept = jnp.swapaxes(jnp.concatenate(accept_chunks, axis=0), 0, 1)
    return FleetResult(thetas=thetas, accept=accept, eps=eps_final)
