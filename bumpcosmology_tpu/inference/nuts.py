"""TPU-native No-U-Turn sampler (L2/L4).

The reference delegates sampling to numpyro's NUTS with ``dense_mass=True``
(``src/scripts/run_fit.py:35``, ``run_cosmo_fit.py:45``); numpyro is not a
dependency of this framework, so the sampler is implemented here from
scratch, designed for the XLA compilation model:

* **Iterative multinomial NUTS** (Betancourt 2017; Stan/numpyro scheme):
  tree doubling via ``lax.while_loop``, subtree construction via an inner
  ``lax.while_loop`` with the O(log n) checkpoint stack for U-turn tests —
  no recursion, fixed-shape carries, one compilation for the whole chain.
* **Dense mass matrix** over the flat unconstrained vector (the model family
  has 12-17 scalar hyperparameters, ``intensity_models.py:281-311``): the
  kinetic energy uses the estimated posterior covariance Σ directly
  (M⁻¹ = Σ), momenta are drawn via a triangular solve against chol(Σ).
* **Stan-style windowed warmup**: dual-averaging step size + Welford
  covariance in doubling slow windows, with the schedule precomputed as
  static per-step flags consumed by one ``lax.scan``.
* **Vectorized chains**: the transition is written per-chain and ``vmap``-ed;
  hundreds of chains batch onto one chip and shard across a mesh along the
  ``chains`` axis (cf. :mod:`bumpcosmology_tpu.parallel`).

State is checkpointable: :class:`WarmupResult` (position + step size + mass
matrix) round-trips through ``save_warmup``/``load_warmup`` — the mid-MCMC
resume capability the reference lacks (SURVEY.md §5).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NutsConfig",
    "ChainState",
    "WarmupResult",
    "NutsStats",
    "nuts_transition",
    "warmup_schedule",
    "run_warmup",
    "run_sampling",
    "run_nuts",
]

_DIVERGENCE_THRESHOLD = 1000.0


class NutsConfig(NamedTuple):
    max_depth: int = 10
    target_accept: float = 0.8
    # dual averaging (Hoffman & Gelman 2014 defaults)
    da_gamma: float = 0.05
    da_t0: float = 10.0
    da_kappa: float = 0.75
    dense_mass: bool = True
    # Pool Welford statistics across the vectorized chain batch at window
    # ends (one shared mass matrix).  With many chains this gives far better
    # covariance estimates per warmup step than the reference's per-chain
    # adaptation — the "many chains, short warmup" regime TPUs favor.
    shared_mass: bool = False


class ChainState(NamedTuple):
    """Per-chain kernel state (all leaves have a leading chain axis when vmapped)."""

    theta: jnp.ndarray  # (dim,) unconstrained position
    u: jnp.ndarray  # potential at theta
    grad: jnp.ndarray  # (dim,) gradient of potential at theta


class _DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


class _WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray  # (dim,)
    m2: jnp.ndarray  # (dim, dim) for dense mass; (dim,) diagonal otherwise


class WarmupResult(NamedTuple):
    """Adapted sampler state — sufficient to resume or start sampling."""

    state: ChainState
    eps: jnp.ndarray
    cov: jnp.ndarray  # (dim, dim) mass-matrix inverse (posterior covariance estimate)
    chol_cov: jnp.ndarray  # (dim, dim) lower Cholesky of cov


class NutsStats(NamedTuple):
    """Per-draw sampler statistics."""

    accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    tree_depth: jnp.ndarray
    n_leapfrog: jnp.ndarray
    energy: jnp.ndarray
    step_size: jnp.ndarray


# ---------------------------------------------------------------------------
# Leapfrog + kinetic energy (dense mass)
# ---------------------------------------------------------------------------


# Mass-matrix products run at HIGHEST precision: the TPU MXU's default f32
# dot is a single bf16 pass, and a ~2^-9-relative error in the leapfrog drift
# is integrator noise the step-size adaptation then has to absorb.  At
# O(15x15) the cost is irrelevant.
def _matvec(cov, p):
    return jnp.dot(cov, p, precision=jax.lax.Precision.HIGHEST)


def _kinetic(p, cov):
    return 0.5 * jnp.dot(p, _matvec(cov, p), precision=jax.lax.Precision.HIGHEST)


def _velocity(p, cov):
    return _matvec(cov, p)


def _leapfrog(value_and_grad, theta, p, grad, eps, cov):
    p_half = p - 0.5 * eps * grad
    theta_new = theta + eps * _matvec(cov, p_half)
    u_new, grad_new = value_and_grad(theta_new)
    # pin to the position dtype: a model constant can silently down/up-cast
    # the potential's return, which would break fixed-shape loop carries
    u_new = u_new.astype(theta.dtype)
    grad_new = grad_new.astype(theta.dtype)
    p_new = p_half - 0.5 * eps * grad_new
    return theta_new, p_new, u_new, grad_new


def _sample_momentum(key, chol_cov, dim, dtype):
    """p ~ N(0, Σ⁻¹): solve chol(Σ)ᵀ p = ξ."""
    xi = jax.random.normal(key, (dim,), dtype=dtype)
    return jax.scipy.linalg.solve_triangular(chol_cov.T, xi, lower=False)


# ---------------------------------------------------------------------------
# One NUTS transition (per chain)
# ---------------------------------------------------------------------------


class _TreeCarry(NamedTuple):
    key: jnp.ndarray
    # trajectory extremes (forward-time momenta)
    theta_left: jnp.ndarray
    p_left: jnp.ndarray
    grad_left: jnp.ndarray
    theta_right: jnp.ndarray
    p_right: jnp.ndarray
    grad_right: jnp.ndarray
    # multinomial proposal over the whole tree
    theta_prop: jnp.ndarray
    u_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_w: jnp.ndarray
    p_sum: jnp.ndarray
    depth: jnp.ndarray
    done: jnp.ndarray
    diverging: jnp.ndarray
    accept_sum: jnp.ndarray
    n_leaf: jnp.ndarray


class _SubtreeCarry(NamedTuple):
    key: jnp.ndarray
    theta: jnp.ndarray  # current integration end
    p: jnp.ndarray
    u: jnp.ndarray
    grad: jnp.ndarray
    # subtree accumulators
    theta_prop: jnp.ndarray
    u_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_w: jnp.ndarray
    p_sum: jnp.ndarray
    accept_sum: jnp.ndarray
    leaf: jnp.ndarray  # number of leaves built so far
    turning: jnp.ndarray
    diverging: jnp.ndarray
    # U-turn checkpoint stack (left ends of open power-of-2 blocks)
    ptr: jnp.ndarray
    p_ckpt: jnp.ndarray  # (max_depth+1, dim)
    s_ckpt: jnp.ndarray  # (max_depth+1, dim) momentum prefix-sum *before* the ckpt leaf


def _count_trailing_zeros(n, width):
    """Trailing zeros of a traced positive int32 (branch-free)."""
    tz = jnp.asarray(0, jnp.int32)
    found = jnp.asarray(False)
    for b in range(width):
        bit_set = (n >> b) & 1
        found = found | (bit_set == 1)
        tz = tz + jnp.where(found, 0, 1)
    return tz


def _build_subtree(value_and_grad, carry_in: _SubtreeCarry, n_leaf, eps_signed, cov, h0, max_depth):
    """Build up to ``n_leaf`` leapfrog leaves in one direction, with the
    checkpoint-stack U-turn tests of the iterative NUTS scheme."""

    dtype = carry_in.theta.dtype

    def cond(c: _SubtreeCarry):
        return (c.leaf < n_leaf) & (~c.turning) & (~c.diverging)

    def body(c: _SubtreeCarry):
        key, k_mn = jax.random.split(c.key)
        theta, p, u, grad = _leapfrog(value_and_grad, c.theta, c.p, c.grad, eps_signed, cov)
        h = u + _kinetic(p, cov)
        h = jnp.where(jnp.isnan(h), jnp.inf, h)
        dh = h - h0
        diverging = dh > _DIVERGENCE_THRESHOLD
        accept = jnp.exp(jnp.minimum(-dh, 0.0))
        log_w_leaf = -dh

        # progressive multinomial sampling within the subtree
        log_w_new = jnp.logaddexp(c.log_w, log_w_leaf)
        take_new = jnp.log(jax.random.uniform(k_mn, dtype=dtype)) < (log_w_leaf - log_w_new)
        theta_prop = jnp.where(take_new, theta, c.theta_prop)
        u_prop = jnp.where(take_new, u, c.u_prop)
        grad_prop = jnp.where(take_new, grad, c.grad_prop)

        leaf = c.leaf  # index of the leaf just built (0-based)
        p_sum = c.p_sum + p

        # push checkpoint at even leaves (left end of new power-of-2 blocks)
        is_even = (leaf % 2) == 0
        ptr = c.ptr
        p_ckpt = jnp.where(is_even, c.p_ckpt.at[ptr].set(p), c.p_ckpt)
        s_ckpt = jnp.where(is_even, c.s_ckpt.at[ptr].set(c.p_sum), c.s_ckpt)
        ptr = ptr + jnp.where(is_even, 1, 0)

        # Completed power-of-2 blocks end at this leaf: sizes 2^1..2^K with
        # K = tz(leaf+1); their left ends are the top K checkpoints (top =
        # most recent).  The deepest of those (left end a_K) also starts a
        # larger, still-open block, so only the top K-1 checkpoints die.
        ncheck = _count_trailing_zeros(leaf + 1, max_depth + 1)

        def check_body(j, tp):
            turning, ptr_ = tp
            do = j < ncheck
            idx = jnp.maximum(ptr_ - 1 - j, 0)
            rho = p_sum - s_ckpt[idx]
            v_start = _velocity(p_ckpt[idx], cov)
            v_end = _velocity(p, cov)
            turn_j = (jnp.dot(v_start, rho) <= 0.0) | (jnp.dot(v_end, rho) <= 0.0)
            return (turning | (do & turn_j), ptr_)

        turning, _ = jax.lax.fori_loop(0, max_depth + 1, check_body, (c.turning, ptr))
        ptr = ptr - jnp.maximum(ncheck - 1, 0)

        return _SubtreeCarry(
            key=key,
            theta=theta,
            p=p,
            u=u,
            grad=grad,
            theta_prop=theta_prop,
            u_prop=u_prop,
            grad_prop=grad_prop,
            log_w=log_w_new,
            p_sum=p_sum,
            accept_sum=c.accept_sum + accept,
            leaf=leaf + 1,
            turning=turning,
            diverging=diverging,
            ptr=ptr,
            p_ckpt=p_ckpt,
            s_ckpt=s_ckpt,
        )

    return jax.lax.while_loop(cond, body, carry_in)


def nuts_transition(
    potential_fn: Callable,
    state: ChainState,
    eps: jnp.ndarray,
    cov: jnp.ndarray,
    chol_cov: jnp.ndarray,
    key: jnp.ndarray,
    max_depth: int = 10,
):
    """One NUTS draw for a single chain.  vmap over chains for batched sampling."""
    value_and_grad = jax.value_and_grad(potential_fn)
    dim = state.theta.shape[0]
    dtype = state.theta.dtype
    state = ChainState(
        theta=state.theta, u=state.u.astype(dtype), grad=state.grad.astype(dtype)
    )

    key, k_mom = jax.random.split(key)
    p0 = _sample_momentum(k_mom, chol_cov, dim, dtype)
    h0 = state.u + _kinetic(p0, cov)

    zeros_ckpt = jnp.zeros((max_depth + 1, dim), dtype=dtype)

    init = _TreeCarry(
        key=key,
        theta_left=state.theta,
        p_left=p0,
        grad_left=state.grad,
        theta_right=state.theta,
        p_right=p0,
        grad_right=state.grad,
        theta_prop=state.theta,
        u_prop=state.u,
        grad_prop=state.grad,
        log_w=jnp.asarray(0.0, dtype),
        p_sum=p0,
        depth=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        diverging=jnp.asarray(False),
        accept_sum=jnp.asarray(0.0, dtype),
        n_leaf=jnp.asarray(0, jnp.int32),
    )

    def cond(c: _TreeCarry):
        return (~c.done) & (c.depth < max_depth)

    def body(c: _TreeCarry):
        key, k_dir, k_bias = jax.random.split(c.key, 3)
        go_right = jax.random.bernoulli(k_dir)
        eps_signed = jnp.where(go_right, eps, -eps)

        theta0 = jnp.where(go_right, c.theta_right, c.theta_left)
        p0_ = jnp.where(go_right, c.p_right, c.p_left)
        grad0 = jnp.where(go_right, c.grad_right, c.grad_left)

        sub_init = _SubtreeCarry(
            key=key,
            theta=theta0,
            p=p0_,
            u=jnp.asarray(0.0, dtype),
            grad=grad0,
            theta_prop=theta0,
            u_prop=jnp.asarray(jnp.inf, dtype),
            grad_prop=grad0,
            log_w=jnp.asarray(-jnp.inf, dtype),
            p_sum=jnp.zeros((dim,), dtype),
            accept_sum=jnp.asarray(0.0, dtype),
            leaf=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            ptr=jnp.asarray(0, jnp.int32),
            p_ckpt=zeros_ckpt,
            s_ckpt=zeros_ckpt,
        )
        n_leaf = jnp.asarray(1, jnp.int32) << c.depth
        sub = _build_subtree(value_and_grad, sub_init, n_leaf, eps_signed, cov, h0, max_depth)

        valid = (~sub.turning) & (~sub.diverging)

        # biased progressive sampling across the doubling
        log_ratio = sub.log_w - c.log_w
        take_new = valid & (
            jnp.log(jax.random.uniform(k_bias, dtype=dtype)) < jnp.minimum(log_ratio, 0.0)
        )
        theta_prop = jnp.where(take_new, sub.theta_prop, c.theta_prop)
        u_prop = jnp.where(take_new, sub.u_prop, c.u_prop)
        grad_prop = jnp.where(take_new, sub.grad_prop, c.grad_prop)
        log_w = jnp.where(valid, jnp.logaddexp(c.log_w, sub.log_w), c.log_w)

        # extend the moving end only if the subtree is valid
        theta_left = jnp.where(valid & ~go_right, sub.theta, c.theta_left)
        p_left = jnp.where(valid & ~go_right, sub.p, c.p_left)
        grad_left = jnp.where(valid & ~go_right, sub.grad, c.grad_left)
        theta_right = jnp.where(valid & go_right, sub.theta, c.theta_right)
        p_right = jnp.where(valid & go_right, sub.p, c.p_right)
        grad_right = jnp.where(valid & go_right, sub.grad, c.grad_right)
        p_sum = jnp.where(valid, c.p_sum + sub.p_sum, c.p_sum)

        # global U-turn across the merged trajectory
        v_left = _velocity(p_left, cov)
        v_right = _velocity(p_right, cov)
        turning_global = (jnp.dot(v_left, p_sum) <= 0.0) | (jnp.dot(v_right, p_sum) <= 0.0)

        done = (~valid) | turning_global

        return _TreeCarry(
            key=sub.key,
            theta_left=theta_left,
            p_left=p_left,
            grad_left=grad_left,
            theta_right=theta_right,
            p_right=p_right,
            grad_right=grad_right,
            theta_prop=theta_prop,
            u_prop=u_prop,
            grad_prop=grad_prop,
            log_w=log_w,
            p_sum=p_sum,
            depth=c.depth + 1,
            done=done,
            diverging=c.diverging | sub.diverging,
            accept_sum=c.accept_sum + sub.accept_sum,
            n_leaf=c.n_leaf + sub.leaf,
        )

    out = jax.lax.while_loop(cond, body, init)

    n_leaf = jnp.maximum(out.n_leaf, 1)
    accept_prob = out.accept_sum / n_leaf.astype(dtype)
    new_state = ChainState(theta=out.theta_prop, u=out.u_prop, grad=out.grad_prop)
    stats = NutsStats(
        accept_prob=accept_prob,
        diverging=out.diverging,
        tree_depth=out.depth,
        n_leapfrog=out.n_leaf,
        energy=out.u_prop,
        step_size=eps,
    )
    return new_state, stats


# ---------------------------------------------------------------------------
# Step-size search + dual averaging
# ---------------------------------------------------------------------------


def _find_reasonable_eps(value_and_grad, state: ChainState, cov, chol_cov, key, target=0.8):
    """Double/halve eps until the one-step accept probability crosses 0.5
    (Hoffman & Gelman 2014, Algorithm 4 spirit).  The model is evaluated once
    per iteration (the accept probability is carried, not recomputed in the
    loop condition) to keep the compiled program small."""
    dtype = state.theta.dtype
    dim = state.theta.shape[0]
    key, k_mom = jax.random.split(key)
    p0 = _sample_momentum(k_mom, chol_cov, dim, dtype)
    h0 = state.u + _kinetic(p0, cov)

    def accept_prob(eps):
        _, p1, u1, _ = _leapfrog(value_and_grad, state.theta, p0, state.grad, eps, cov)
        h1 = u1 + _kinetic(p1, cov)
        h1 = jnp.where(jnp.isnan(h1), jnp.inf, h1)
        return jnp.exp(jnp.minimum(h0 - h1, 0.0))

    eps0 = jnp.asarray(1.0, dtype)
    ap0 = accept_prob(eps0)
    direction = jnp.where(ap0 > 0.5, 1.0, -1.0)
    factor = jnp.where(direction > 0, 2.0, 0.5).astype(dtype)

    def cond(carry):
        eps, ap, i = carry
        keep = jnp.where(direction > 0, ap > 0.5, ap < 0.5)
        return keep & (i < 60)

    def body(carry):
        eps, ap, i = carry
        new_eps = eps * factor
        return new_eps, accept_prob(new_eps), i + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, ap0, jnp.asarray(0, jnp.int32)))
    return eps


def _da_init(eps, dtype):
    return _DualAveragingState(
        log_eps=jnp.log(eps).astype(dtype),
        log_eps_bar=jnp.asarray(0.0, dtype),
        h_bar=jnp.asarray(0.0, dtype),
        mu=jnp.log(10.0 * eps).astype(dtype),
        t=jnp.asarray(0.0, dtype),
    )


def _da_update(da: _DualAveragingState, accept_prob, cfg: NutsConfig):
    t = da.t + 1.0
    eta_h = 1.0 / (t + cfg.da_t0)
    h_bar = (1.0 - eta_h) * da.h_bar + eta_h * (cfg.target_accept - accept_prob)
    log_eps = da.mu - jnp.sqrt(t) / cfg.da_gamma * h_bar
    eta_x = t ** (-cfg.da_kappa)
    log_eps_bar = eta_x * log_eps + (1.0 - eta_x) * da.log_eps_bar
    return _DualAveragingState(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, mu=da.mu, t=t)


# ---------------------------------------------------------------------------
# Welford covariance
# ---------------------------------------------------------------------------


def _welford_init(dim, dtype):
    return _WelfordState(
        count=jnp.asarray(0.0, dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
    )


def _welford_update(w: _WelfordState, x):
    count = w.count + 1.0
    delta = x - w.mean
    mean = w.mean + delta / count
    delta2 = x - mean
    m2 = w.m2 + jnp.outer(delta, delta2)
    return _WelfordState(count=count, mean=mean, m2=m2)


def _welford_cov(w: _WelfordState, regularize: bool = True):
    n = jnp.maximum(w.count, 2.0)
    cov = w.m2 / (n - 1.0)
    if regularize:
        # Stan's shrinkage toward a scaled identity
        shrink = n / (n + 5.0)
        cov = shrink * cov + 1e-3 * (1.0 - shrink) * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return cov


# ---------------------------------------------------------------------------
# Warmup schedule (Stan windows)
# ---------------------------------------------------------------------------


def warmup_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Stan-style windows as segments: a list of (n_steps, update_mass_at_end).

    Fast buffers adapt step size only; slow windows double in length and each
    ends with a dense-mass update + dual-averaging reset.
    """
    if num_warmup < 20:
        return [(num_warmup, False)] if num_warmup else []
    if init_buffer + term_buffer + base_window > num_warmup:
        scale = num_warmup / (init_buffer + term_buffer + base_window)
        init_buffer = int(init_buffer * scale)
        term_buffer = int(term_buffer * scale)
        base_window = num_warmup - init_buffer - term_buffer
    segments = [(init_buffer, False)]
    start = init_buffer
    size = base_window
    while start < num_warmup - term_buffer:
        end = start + size
        if end + 2 * size > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        segments.append((end - start, True))
        start = end
        size *= 2
    if term_buffer:
        segments.append((term_buffer, False))
    return segments


# ---------------------------------------------------------------------------
# Drivers (vectorized chains)
#
# The warmup/sampling loops are *chunked*: one small jitted scan program of
# fixed length is reused for the whole run, with window bookkeeping (mass
# updates, dual-averaging resets, Welford resets) at the Python level between
# chunks.  One monolithic scan with lax.cond window logic compiles to a much
# larger program — large enough to break remote-compile TPU paths — for zero
# runtime benefit.
# ---------------------------------------------------------------------------

# Chunk sizes bound the wall-clock of a *single* XLA program execution.
# Remote-attached TPU paths (e.g. the axon tunnel) enforce per-execution
# deadlines of roughly a minute; early-warmup NUTS steps can cost ~2s each
# (max-depth trees at unadapted step sizes), so chunks stay small.  Post-
# warmup steps are ~100x cheaper and per-chunk dispatch overhead is
# negligible either way.
_CHUNK = 10


def _init_chain_state(potential_fn, theta0):
    u, grad = jax.value_and_grad(potential_fn)(theta0)
    return ChainState(
        theta=theta0, u=u.astype(theta0.dtype), grad=grad.astype(theta0.dtype)
    )


@partial(jax.jit, static_argnames=("potential_fn",))
def _init_chains(potential_fn, theta0, keys):
    """Vmapped chain init + reasonable-eps search (one compact program)."""
    nchains, dim = theta0.shape
    dtype = theta0.dtype
    vag = jax.value_and_grad(potential_fn)

    def per_chain(theta, k):
        state = _init_chain_state(potential_fn, theta)
        eye = jnp.eye(dim, dtype=dtype)
        eps = _find_reasonable_eps(vag, state, eye, eye, k)
        return state, eps

    state, eps = jax.vmap(per_chain)(theta0, keys)
    cov = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (nchains, dim, dim))
    return state, eps, cov


@partial(jax.jit, static_argnames=("potential_fn", "n_steps", "cfg"))
def _warmup_chunk(potential_fn, state, cov, chol, da, wf, key, n_steps: int, cfg: NutsConfig):
    """n_steps of transition + dual-averaging + Welford, mass matrix frozen."""
    nchains = state.theta.shape[0]

    def step(carry, step_key):
        state, da, wf = carry
        chain_keys = jax.random.split(step_key, nchains)
        eps = jnp.exp(da.log_eps)
        new_state, stats = jax.vmap(
            lambda s, e, c, ch, k: nuts_transition(potential_fn, s, e, c, ch, k, cfg.max_depth)
        )(state, eps, cov, chol, chain_keys)
        da = jax.vmap(lambda d, a: _da_update(d, a, cfg))(da, stats.accept_prob)
        wf = jax.vmap(_welford_update)(wf, new_state.theta)
        return (new_state, da, wf), stats.accept_prob

    step_keys = jax.random.split(key, n_steps)
    (state, da, wf), accept = jax.lax.scan(step, (state, da, wf), step_keys)
    return state, da, wf, accept


def _pool_welford(wf: _WelfordState) -> _WelfordState:
    """Combine per-chain Welford states (Chan et al. pairwise formula) into a
    single state, broadcast back over the chain axis."""
    nchains = wf.count.shape[0]
    n_total = jnp.sum(wf.count)
    n_safe = jnp.maximum(n_total, 1.0)
    mean = jnp.sum(wf.count[:, None] * wf.mean, axis=0) / n_safe
    delta = wf.mean - mean[None, :]
    m2 = jnp.sum(wf.m2, axis=0) + jnp.sum(
        wf.count[:, None, None] * delta[:, :, None] * delta[:, None, :], axis=0
    )
    return _WelfordState(
        count=jnp.broadcast_to(n_total, (nchains,)),
        mean=jnp.broadcast_to(mean, wf.mean.shape),
        m2=jnp.broadcast_to(m2, wf.m2.shape),
    )


@partial(jax.jit, static_argnames=("shared_mass",))
def _end_window(cov, chol, da, wf, shared_mass: bool = False):
    """Mass-matrix update from the window's Welford state + DA reset."""
    nchains, dim = da.log_eps.shape[0], cov.shape[-1]
    dtype = cov.dtype
    if shared_mass:
        wf = _pool_welford(wf)
    new_cov = jax.vmap(_welford_cov)(wf)
    new_chol = jax.vmap(jnp.linalg.cholesky)(new_cov)
    bad = jax.vmap(lambda c: jnp.any(jnp.isnan(c)))(new_chol)
    new_cov = jnp.where(bad[:, None, None], cov, new_cov)
    new_chol = jnp.where(bad[:, None, None], chol, new_chol)
    eps_now = jnp.exp(da.log_eps)
    new_da = jax.vmap(lambda e: _da_init(e, dtype))(eps_now)
    new_wf = _batched_welford_init(nchains, dim, dtype)
    return new_cov, new_chol, new_da, new_wf


def _batched_welford_init(nchains, dim, dtype):
    return _WelfordState(
        count=jnp.zeros((nchains,), dtype),
        mean=jnp.zeros((nchains, dim), dtype),
        m2=jnp.zeros((nchains, dim, dim), dtype),
    )


def run_warmup(
    potential_fn: Callable,
    theta0: jnp.ndarray,  # (chains, dim)
    key: jnp.ndarray,
    num_warmup: int,
    cfg: NutsConfig = NutsConfig(),
    progress: Optional[Callable[[int, int, float], None]] = None,
    chunk_size: Optional[int] = None,
):
    """Windowed warmup for a batch of chains (each adapts independently,
    matching the reference's per-chain numpyro adaptation).

    ``progress(step, num_warmup, mean_accept)`` is called after every chunk.
    ``chunk_size`` bounds the steps per XLA execution (default ``_CHUNK``);
    wide chain batches on deadline-limited remote TPUs need smaller chunks
    since every chain in the batch runs each step in lockstep.
    """
    chunk = chunk_size or _CHUNK
    nchains, dim = theta0.shape
    dtype = theta0.dtype

    keys = jax.random.split(key, nchains + 1)
    state, eps, cov = _init_chains(potential_fn, theta0, keys[:nchains])
    chol = cov  # identity
    da = jax.vmap(lambda e: _da_init(e, dtype))(eps)
    wf = _batched_welford_init(nchains, dim, dtype)

    chunk_key = keys[nchains]
    total_done = 0
    for n_steps, update_mass in warmup_schedule(num_warmup):
        done = 0
        while done < n_steps:
            n = min(chunk, n_steps - done)
            chunk_key, k = jax.random.split(chunk_key)
            state, da, wf, accept = _warmup_chunk(
                potential_fn, state, cov, chol, da, wf, k, n, cfg
            )
            done += n
            total_done += n
            if progress is not None:
                progress(total_done, num_warmup, float(jnp.mean(accept)))
        if update_mass:
            cov, chol, da, wf = _end_window(cov, chol, da, wf, shared_mass=cfg.shared_mass)
        else:
            # fast buffer: discard its Welford statistics, keep step size
            wf = _batched_welford_init(nchains, dim, dtype)

    eps_final = jnp.exp(da.log_eps_bar)
    return WarmupResult(state=state, eps=eps_final, cov=cov, chol_cov=chol), None


@partial(jax.jit, static_argnames=("potential_fn", "n_steps", "cfg"))
def _sample_chunk(potential_fn, state, eps, cov, chol, key, n_steps: int, cfg: NutsConfig):
    nchains = state.theta.shape[0]

    def step(state, step_key):
        chain_keys = jax.random.split(step_key, nchains)
        new_state, stats = jax.vmap(
            lambda s, e, c, ch, k: nuts_transition(potential_fn, s, e, c, ch, k, cfg.max_depth)
        )(state, eps, cov, chol, chain_keys)
        return new_state, (new_state.theta, stats)

    step_keys = jax.random.split(key, n_steps)
    state, (thetas, stats) = jax.lax.scan(step, state, step_keys)
    return state, thetas, stats


def _sampling_ckpt_file(checkpoint_path: str) -> str:
    from bumpcosmology_tpu.utils.checkpoint import checkpoint_file

    return checkpoint_file(checkpoint_path)[: -len(".npz")] + ".sampling.npz"


def _save_sampling_ckpt(path, done, key, state, theta_chunks, stats_chunks):
    import numpy as np

    thetas = jnp.concatenate(theta_chunks, axis=0)
    stats = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *stats_chunks)
    payload = {
        "done": np.asarray(done),
        "key": np.asarray(key),
        "state_theta": np.asarray(state.theta),
        "state_u": np.asarray(state.u),
        "state_grad": np.asarray(state.grad),
        "thetas": np.asarray(thetas),
    }
    for name in NutsStats._fields:
        payload["stats_" + name] = np.asarray(getattr(stats, name))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    import os

    os.replace(tmp, path)


def _load_sampling_ckpt(path):
    import numpy as np

    with np.load(path) as d:
        state = ChainState(
            theta=jnp.asarray(d["state_theta"]),
            u=jnp.asarray(d["state_u"]),
            grad=jnp.asarray(d["state_grad"]),
        )
        stats = NutsStats(
            **{name: jnp.asarray(d["stats_" + name]) for name in NutsStats._fields}
        )
        return int(d["done"]), jnp.asarray(d["key"]), state, jnp.asarray(d["thetas"]), stats


def run_sampling(
    potential_fn: Callable,
    warm: WarmupResult,
    key: jnp.ndarray,
    num_samples: int,
    cfg: NutsConfig = NutsConfig(),
    chunk_size: int = 25,
    progress: Optional[Callable[[int, int], None]] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 4,
):
    """Post-warmup sampling: returns (samples (chains, num_samples, dim), stats).

    With ``checkpoint_path``, completed draw chunks persist to
    ``<path>.sampling.npz`` every ``checkpoint_every`` chunks, so a crash (or
    the ~60 s remote-TPU execution deadline) at draw 900/1000 resumes instead
    of losing the phase.  The file is removed on successful completion.
    """
    import os

    state = warm.state
    theta_chunks = []
    stats_chunks = []
    done = 0
    ckpt = _sampling_ckpt_file(checkpoint_path) if checkpoint_path is not None else None
    if ckpt is not None and os.path.exists(ckpt):
        done, key, state, thetas0, stats0 = _load_sampling_ckpt(ckpt)
        if done > num_samples:  # config shrank; drop the excess
            thetas0 = thetas0[:num_samples]
            stats0 = jax.tree.map(lambda x: x[:num_samples], stats0)
            done = num_samples
        theta_chunks.append(thetas0)
        stats_chunks.append(stats0)
        if progress is not None:
            progress(done, num_samples)
    chunks_since_ckpt = 0
    while done < num_samples:
        n = min(chunk_size, num_samples - done)
        key, k = jax.random.split(key)
        state, thetas, stats = _sample_chunk(
            potential_fn, state, warm.eps, warm.cov, warm.chol_cov, k, n, cfg
        )
        theta_chunks.append(thetas)
        stats_chunks.append(stats)
        done += n
        chunks_since_ckpt += 1
        if ckpt is not None and (chunks_since_ckpt >= checkpoint_every or done >= num_samples):
            jax.block_until_ready(state.theta)
            if done < num_samples:
                _save_sampling_ckpt(ckpt, done, key, state, theta_chunks, stats_chunks)
            chunks_since_ckpt = 0
        if progress is not None:
            jax.block_until_ready(state.theta)  # report real execution progress
            progress(done, num_samples)
    if ckpt is not None and os.path.exists(ckpt):
        os.remove(ckpt)

    thetas = jnp.concatenate(theta_chunks, axis=0)
    stats = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *stats_chunks)
    # (num_samples, chains, ...) -> (chains, num_samples, ...)
    thetas = jnp.swapaxes(thetas, 0, 1)
    stats = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1) if x.ndim >= 2 else x, stats)
    return thetas, stats, WarmupResult(state, warm.eps, warm.cov, warm.chol_cov)


def run_nuts(
    potential_fn: Callable,
    theta0: jnp.ndarray,
    key: jnp.ndarray,
    num_warmup: int = 1000,
    num_samples: int = 1000,
    cfg: NutsConfig = NutsConfig(),
):
    """Warmup + sampling in one call (the ``MCMC.run`` equivalent,
    cf. ``run_fit.py:36-39``)."""
    k_warm, k_sample = jax.random.split(key)
    warm, warm_stats = run_warmup(potential_fn, theta0, k_warm, num_warmup, cfg)
    samples, stats, final = run_sampling(potential_fn, warm, k_sample, num_samples, cfg)
    return samples, stats, warm, final
