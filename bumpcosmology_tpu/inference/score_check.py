"""Score-identity check: E_{data|θ₀}[∇_θ log L̂(θ₀; data)] = 0.

If catalogs are really drawn from the model at θ₀, the expected score of the
fitted log-likelihood at θ₀ vanishes — for the TOTAL (event + selection)
score only.  The per-event marginal and the selection factor separately have
equal-and-opposite *nonzero* expectations (each term alone is not a
normalized likelihood in θ), so the per-term rows this module reports are
attribution aids — which term moved when the total breaks — NOT pass
criteria; the stage gates on the TOTAL |z| alone (per-term z of O(10³) with
TOTAL ≤ 2 is the healthy signature, ``scratch/score_arms.log``).  A
significantly nonzero TOTAL mean score is a *generative/model mismatch* (a
simulator channel the likelihood omits, a support clip, a biased estimator),
attributed to a specific hyperparameter direction, measured in minutes
without a single fit.

This is the instrument that found the round-3 λ root cause: without the
observed-SNR channel in the PE banks the event-term λ score sat at z = +10.4
over 200 catalogs; with it every site's |z| ≤ 2 (``docs/DESIGN.md`` §9.5,
``scratch/score_arms.log``).  The rank histogram (SBC) detects the same
defect only after hundreds of full fits and cannot say *which term* is wrong.

The check is quadratic-cost in nothing: one value-and-grad per simulated
catalog at fixed θ₀.  It complements SBC (which also certifies the sampler
and the prior transforms) — pass score-check first, then spend the fleet
hours on SBC.

No reference counterpart: the reference has no calibration machinery at all
(SURVEY.md §4); its mock branch is eyeballed via a corner plot.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ScoreCheckResult", "score_identity_check", "joint_term_grads"]


class ScoreCheckResult(NamedTuple):
    """Mean scores with standard errors, per (term, site).

    ``mean``/``se``/``z``: arrays of shape (3, n_sites) — rows are the event
    term, the selection term, and their total.  ``z = mean / se``; under the
    null every entry is asymptotically standard normal.
    """

    sites: tuple
    mean: np.ndarray
    se: np.ndarray
    z: np.ndarray
    n_catalogs: int

    def max_abs_z(self) -> float:
        return float(np.max(np.abs(self.z[2])))

    def table(self) -> str:
        rows = ["term      site        mean      se        z"]
        for t, name in ((0, "event"), (1, "selection"), (2, "TOTAL")):
            for j, k in enumerate(self.sites):
                rows.append(
                    f"{name:9s} {k:10s} {self.mean[t, j]:+.4f}  "
                    f"{self.se[t, j]:.4f}  {self.z[t, j]:+.1f}"
                )
        return "\n".join(rows)


def joint_term_grads(
    sites0: Dict[str, jnp.ndarray],
    grad_sites: Sequence[str],
    nobs: int,
    n_grid: int = 256,
    n_z: int = 1024,
    build=None,
):
    """(data) → (g_event, g_selection) for the joint detector-frame models.

    ``build`` selects the mass family exactly as in
    :func:`~bumpcosmology_tpu.inference.likelihoods.pop_cosmo_loglike`
    (``None`` = PISN bump; ``_build_plpeak`` = POWER-LAW+PEAK).  The two
    likelihood terms are Σ_events [logsumexp − log nsamp] and
    −nobs·(logsumexp − log Ndraw) (``intensity_models.py:334-340``).
    """
    from bumpcosmology_tpu.inference.likelihoods import _pop_cosmo_event_sel_logwts
    from bumpcosmology_tpu.ops.logsumexp import logsumexp

    sites0 = {k: jnp.asarray(v, jnp.float32) for k, v in sites0.items()}
    grad_sites = tuple(grad_sites)

    @jax.jit
    def term_grads(data):
        def term(vals, which):
            s = dict(sites0)
            for k, v in zip(grad_sites, vals):
                s[k] = v
            _, _, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(
                s, data, n_grid, n_z, build=build
            )
            ev = jnp.sum(logsumexp(log_wts, axis=1) - math.log(log_wts.shape[1]))
            sel = -float(nobs) * (logsumexp(log_sel_wts) - data.selection.log_ndraw)
            return jnp.where(which == 0, ev, sel)

        vals = jnp.stack([sites0[k] for k in grad_sites])
        return jax.grad(lambda v: term(v, 0))(vals), jax.grad(lambda v: term(v, 1))(vals)

    return term_grads


def score_identity_check(
    simulate: Callable,
    sites0: Dict[str, np.ndarray],
    term_grads: Callable,
    grad_sites: Sequence[str],
    n_catalogs: int = 200,
    seed: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
) -> ScoreCheckResult:
    """Run the check: simulate ``n_catalogs`` at θ₀ = ``sites0``, average the
    per-term scores returned by ``term_grads(data)``.

    ``simulate(rng, sites0)`` must draw one catalog from the model at θ₀
    (the SBC simulators qualify).  The standard errors are empirical across
    catalogs, so correlated terms within one catalog are handled exactly.
    """
    rng = np.random.default_rng(seed)
    np_sites = {k: np.asarray(v) for k, v in sites0.items()}
    scores = []
    for i in range(n_catalogs):
        data = simulate(rng, np_sites)
        g_ev, g_sel = term_grads(data)
        scores.append(np.stack([np.asarray(g_ev), np.asarray(g_sel)]))
        if progress is not None:
            progress(i + 1, n_catalogs)
    arr = np.asarray(scores)  # (n, 2, k)
    arr = np.concatenate([arr, arr.sum(axis=1, keepdims=True)], axis=1)  # + total
    mean = arr.mean(axis=0)
    se = arr.std(axis=0, ddof=1) / np.sqrt(len(arr))
    # a zero-variance nonzero score is an (infinitely significant)
    # deterministic bias, not a pass — keep the sign, not a silent 0
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(
            se > 0, mean / np.where(se > 0, se, 1.0),
            np.where(mean == 0, 0.0, np.sign(mean) * np.inf),
        )
    return ScoreCheckResult(
        sites=tuple(grad_sites), mean=mean, se=se, z=z, n_catalogs=n_catalogs
    )
