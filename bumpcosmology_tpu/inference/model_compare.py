"""Predictive model comparison: PSIS-LOO and WAIC over per-event likelihoods.

The reference fits two models of the same 56-event catalog — ``pop_model``
(fixed Planck18 cosmology, ``intensity_models.py:313-355``) and
``pop_cosmo_model`` (sampled flat wCDM, ``intensity_models.py:357-406``) —
but offers no machinery to compare them.  Here the hierarchical likelihood's
natural per-event decomposition

    log L(θ) = Σ_i ℓ_i(θ),   ℓ_i(θ) = log p̂(d_i | θ) − log μ_sel(θ)

(each detected event contributes its selection-normalized marginal — the
Monte-Carlo event term of ``intensity_models.py:334-336`` minus its share of
the ``−nobs·log μ_sel`` factor of ``:338-340``; the rate R is analytically
marginalized in this scale-free form) feeds the standard Bayesian
leave-one-out machinery:

* :func:`psis_loo` — Pareto-smoothed importance-sampling LOO
  (Vehtari, Gelman & Gabry 2017), with the per-event Pareto k̂ diagnostic —
  k̂ > 0.7 flags events whose posterior influence makes plain importance
  sampling unreliable (a cheap, always-on complement to the refit-based
  ``pipeline loo`` influence stage).
* :func:`waic` — the Watanabe–Akaike criterion on the same matrix.
* :func:`compare` — elpd difference table with paired standard errors.

The pointwise matrices are computed on-device (one vmapped likelihood pass
over thinned posterior draws); the PSIS/GPD machinery is host-side numpy.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference.likelihoods import (
    DEFAULT_N_GRID,
    PopCosmoData,
    PopData,
    _pop_cosmo_event_sel_logwts,
    _pop_event_sel_logwts,
)
from bumpcosmology_tpu.ops.logsumexp import logsumexp

__all__ = [
    "pop_pointwise_loglike",
    "pop_cosmo_pointwise_loglike",
    "pointwise_matrix",
    "fit_gpd",
    "psis_smooth_logratios",
    "psis_loo",
    "waic",
    "compare",
    "LooResult",
    "WaicResult",
]


# ---------------------------------------------------------------- pointwise


def pop_pointwise_loglike(
    sites: Dict[str, jnp.ndarray], data: PopData, n_grid: int = DEFAULT_N_GRID, build=None
) -> jnp.ndarray:
    """(nobs,) per-event ℓ_i(θ) for the population-only model; sums to
    :func:`~bumpcosmology_tpu.inference.likelihoods.pop_loglike`.  ``build``
    selects the mass-model family (``None`` = PISN bump), so the same
    decomposition serves ``pipeline compare`` across families."""
    ev = data.events
    _, nsamp = ev.a.shape
    _, log_wts, log_sel_wts = _pop_event_sel_logwts(sites, data, n_grid, build)
    log_like = logsumexp(log_wts, axis=1) - math.log(nsamp)
    log_mu_sel = logsumexp(log_sel_wts) - data.selection.log_ndraw
    return log_like - log_mu_sel


def pop_cosmo_pointwise_loglike(
    sites: Dict[str, jnp.ndarray],
    data: PopCosmoData,
    n_grid: int = DEFAULT_N_GRID,
    n_z: int = 1024,
    dl_bounds=None,
    build=None,
) -> jnp.ndarray:
    """(nobs,) per-event ℓ_i(θ) for the joint model; sums to
    :func:`~bumpcosmology_tpu.inference.likelihoods.pop_cosmo_loglike`."""
    ev = data.events
    _, nsamp = ev.a.shape
    _, _, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(
        sites, data, n_grid, n_z, dl_bounds, build
    )
    log_like = logsumexp(log_wts, axis=1) - math.log(nsamp)
    log_mu_sel = logsumexp(log_sel_wts) - data.selection.log_ndraw
    return log_like - log_mu_sel


def pointwise_matrix(
    pointwise_fn: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
    posterior: Dict[str, np.ndarray],
    site_names,
    max_draws: int = 1024,
    seed: int = 0,
    batch: int = 64,
) -> np.ndarray:
    """(S, nobs) pointwise log-likelihood matrix from a constrained trace.

    ``posterior`` maps site name → (chains, draws) arrays (a saved
    :class:`~bumpcosmology_tpu.utils.trace.Trace` posterior); draws are
    flattened across chains and uniformly thinned to ``max_draws``.  The
    likelihood evals run vmapped in ``batch``-sized device batches.
    """
    flat = {k: np.asarray(posterior[k]).reshape(-1) for k in site_names}
    total = next(iter(flat.values())).shape[0]
    if total > max_draws:
        idx = np.linspace(0, total - 1, max_draws).round().astype(int)
        flat = {k: v[idx] for k, v in flat.items()}
        total = max_draws

    fn = jax.jit(jax.vmap(lambda s: pointwise_fn(s)))
    rows = []
    for lo in range(0, total, batch):
        hi = min(lo + batch, total)
        if hi - lo < batch:  # pad to the compiled batch shape
            pad = batch - (hi - lo)
            chunk = {
                k: jnp.asarray(np.concatenate([v[lo:hi], v[hi - 1 :][:1].repeat(pad)]))
                for k, v in flat.items()
            }
            rows.append(np.asarray(fn(chunk))[: hi - lo])
        else:
            chunk = {k: jnp.asarray(v[lo:hi]) for k, v in flat.items()}
            rows.append(np.asarray(fn(chunk)))
    return np.concatenate(rows, axis=0)


# ------------------------------------------------------------------- PSIS


def fit_gpd(x: np.ndarray):
    """(k, sigma) of a generalized Pareto fit to exceedances ``x`` ≥ 0.

    Zhang & Stephens (2009) profile-posterior estimator — the same method
    arviz/loo use; no optimizer, quadrature over a data-driven θ grid.
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 5 or x[-1] <= 0:
        return np.inf, np.nan
    prior_bs = 3.0
    m_est = 30 + int(math.sqrt(n))
    jj = np.arange(1, m_est + 1)
    quart = x[int(n / 4 + 0.5) - 1]
    b = 1.0 / x[-1] + (1.0 - np.sqrt(m_est / (jj - 0.5))) / (prior_bs * quart)
    # ξ(b) = mean log1p(−b·x) (ML identity); profile loglik of each candidate
    xi_of_b = np.mean(np.log1p(-b[:, None] * x[None, :]), axis=1)
    l_b = n * (np.log(-(b / xi_of_b)) - xi_of_b - 1.0)
    with np.errstate(over="ignore"):
        w = 1.0 / np.sum(np.exp(l_b - l_b[:, None]), axis=1)
    b_post = np.sum(b * w)
    k = float(np.mean(np.log1p(-b_post * x)))  # ξ̂: > 0 = heavy tail
    sigma = -k / b_post
    # weakly informative prior on k: 10 pseudo-draws at k=0.5 (as arviz/loo)
    k = (n * k + 10.0 * 0.5) / (n + 10.0)
    return float(k), float(sigma)


def psis_smooth_logratios(log_ratios: np.ndarray):
    """(smoothed normalized log-weights, k̂) for one event's draws.

    Fits a GPD to the largest-M raw ratios (M = min(0.2·S, 3·√S)), replaces
    them with expected order statistics of the fit, truncates at the raw
    maximum, and self-normalizes (Vehtari+ 2017 §3.2).
    """
    lr = np.asarray(log_ratios, dtype=np.float64)
    lr = lr - lr.max()  # shift: GPD k is scale-invariant, exp() stays finite
    S = lr.size
    m = int(min(math.ceil(0.2 * S), 3.0 * math.sqrt(S)))
    if m < 5:
        return lr - np.log(np.sum(np.exp(lr))), 0.0

    order = np.argsort(lr)
    tail_idx = order[-m:]
    cutoff = np.exp(lr[order[-m - 1]])
    exceed = np.exp(lr[tail_idx]) - cutoff  # ratio-scale exceedances
    k, sigma = fit_gpd(exceed)
    if np.isfinite(k) and sigma > 0:
        # replace the tail by expected order statistics: GPD quantiles at (j-0.5)/m
        p = (np.arange(1, m + 1) - 0.5) / m
        if abs(k) < 1e-6:
            q = -sigma * np.log1p(-p)
        else:
            q = sigma / k * (np.power(1.0 - p, -k) - 1.0)
        smoothed = np.log(q + cutoff)
        smoothed = np.minimum(smoothed, 0.0)  # truncate at the raw maximum
        lr = lr.copy()
        lr[tail_idx] = smoothed  # tail_idx ascending in lr; q ascending too
    lw = lr - lr.max()
    lw = lw - np.log(np.sum(np.exp(lw)))
    return lw, (k if np.isfinite(k) else np.inf)


class LooResult(NamedTuple):
    elpd: float
    se: float
    p_loo: float
    elpd_i: np.ndarray  # (nobs,)
    khat: np.ndarray  # (nobs,)


class WaicResult(NamedTuple):
    elpd: float
    se: float
    p_waic: float
    elpd_i: np.ndarray


def psis_loo(ll: np.ndarray) -> LooResult:
    """PSIS-LOO from an (S draws, nobs events) pointwise log-lik matrix."""
    ll = np.asarray(ll, dtype=np.float64)
    S, n = ll.shape
    elpd_i = np.empty(n)
    khat = np.empty(n)
    lppd_i = np.empty(n)
    for i in range(n):
        lw, k = psis_smooth_logratios(-ll[:, i])
        elpd_i[i] = _logsumexp_np(lw + ll[:, i])
        khat[i] = k
        lppd_i[i] = _logsumexp_np(ll[:, i]) - math.log(S)
    elpd = float(np.sum(elpd_i))
    se = float(math.sqrt(n * np.var(elpd_i)))
    p_loo = float(np.sum(lppd_i - elpd_i))
    return LooResult(elpd=elpd, se=se, p_loo=p_loo, elpd_i=elpd_i, khat=khat)


def waic(ll: np.ndarray) -> WaicResult:
    """WAIC from the same (S, nobs) matrix."""
    ll = np.asarray(ll, dtype=np.float64)
    S, n = ll.shape
    lppd_i = np.array([_logsumexp_np(ll[:, i]) - math.log(S) for i in range(n)])
    p_i = np.var(ll, axis=0, ddof=1)
    elpd_i = lppd_i - p_i
    return WaicResult(
        elpd=float(np.sum(elpd_i)),
        se=float(math.sqrt(n * np.var(elpd_i))),
        p_waic=float(np.sum(p_i)),
        elpd_i=elpd_i,
    )


def compare(results: Dict[str, LooResult]) -> str:
    """elpd ranking table with paired difference SEs (best model first)."""
    names = sorted(results, key=lambda k: -results[k].elpd)
    best = results[names[0]]
    lines = [f"{'model':16s} {'elpd':>10s} {'se':>7s} {'d_elpd':>8s} {'d_se':>7s} {'max_k':>6s}"]
    for name in names:
        r = results[name]
        d = r.elpd - best.elpd
        diff_i = r.elpd_i - best.elpd_i
        d_se = math.sqrt(diff_i.size * np.var(diff_i)) if name != names[0] else 0.0
        lines.append(
            f"{name:16s} {r.elpd:10.2f} {r.se:7.2f} {d:8.2f} {d_se:7.2f} "
            f"{np.max(r.khat):6.2f}"
        )
    return "\n".join(lines)


def _logsumexp_np(x: np.ndarray) -> float:
    m = np.max(x)
    return float(m + np.log(np.sum(np.exp(x - m))))
