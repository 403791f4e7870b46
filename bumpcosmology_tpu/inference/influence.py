"""Leave-one-out event-influence diagnostics: one fleet, nobs refits.

The reference has no per-event diagnostics beyond the ``neff`` deterministic;
assessing how much any single event drives the posterior (the standard
worry for spectral-siren cosmology: is H0 coming from the catalog or from
one loud outlier?) would cost nobs full refits — hours of recompiles in a
closure-based sampler (cf. ``run_fit.py``'s one static model).

Here the dataset is an argument (:mod:`bumpcosmology_tpu.inference.fleet`),
so all nobs leave-one-out catalogs stack on a fleet axis and refit in
lockstep inside ONE compiled NUTS program: the marginal cost of the whole
diagnostic is about one extra fit's wall time.

Influence is reported in posterior-sd units:

    z_i[site] = (E[site | data without event i] − E[site | full data]) / sd[site | full data]

|z| ≳ 1 flags an event that single-handedly moves that hyperparameter by a
posterior standard deviation.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference.model import (
    ModelSpec,
    _log_prior_and_jac,
    constrain,
    prior_sample,
)

__all__ = ["LooResult", "make_loo_datas", "loo_fit", "influence_summary"]


class LooResult(NamedTuple):
    posterior: Dict[str, np.ndarray]  # site -> (nobs, num_samples) constrained
    accept: np.ndarray  # (nobs, num_samples)
    eps: np.ndarray  # (nobs,) adapted step sizes


def make_loo_datas(data):
    """Stack the nobs leave-one-out catalogs on a leading fleet axis.

    ``data`` is a :class:`PopData` or :class:`PopCosmoData`; fleet member i
    carries the event block with row i deleted — shape (nobs-1, nsamp), one
    common shape for the whole fleet — while the selection set (and any
    fixed-cosmology grid) is replicated.
    """
    ev = data.events
    nobs = ev.a.shape[0]
    if nobs < 2:
        raise ValueError("leave-one-out needs at least 2 events")
    keep = np.stack([np.delete(np.arange(nobs), i) for i in range(nobs)])
    datas_list = [
        data._replace(events=type(ev)(*(jnp.asarray(x)[keep[i]] for x in ev)))
        for i in range(nobs)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *datas_list)


def loo_fit(
    spec: ModelSpec,
    loglike: Callable,
    data,
    key,
    num_warmup: int = 300,
    num_samples: int = 256,
    cfg=None,
    chunk_size: int = 25,
    verbose: bool = True,
) -> LooResult:
    """Fit all nobs leave-one-out catalogs as one lockstep fleet.

    ``spec`` is the full-catalog :class:`ModelSpec` (only its priors and site
    transform are used); ``loglike(sites, data_slice)`` is the
    data-as-argument likelihood (e.g. ``pop_loglike`` partially applied, or
    ``pop_cosmo_loglike`` with static dl bounds covering the full catalog).
    """
    from bumpcosmology_tpu.inference.fleet import fleet_fit
    from bumpcosmology_tpu.inference.nuts import NutsConfig

    nobs = data.events.a.shape[0]
    datas = make_loo_datas(data)

    def make_pot(d):
        def pot(theta):
            sites = constrain(spec, theta)
            return -(_log_prior_and_jac(spec, theta) + loglike(sites, d))

        return pot

    # finite inits from prior candidates (same pattern as the SBC fleet)
    key, k_cand, k_fit = jax.random.split(key, 3)
    n_cand = 32
    cands = jax.vmap(lambda k: prior_sample(spec, k, shape=(n_cand,)))(
        jax.random.split(k_cand, nobs)
    )
    u = jax.jit(jax.vmap(lambda d, c: jax.vmap(make_pot(d))(c)))(datas, cands)
    finite = jnp.isfinite(u)
    if not bool(jnp.all(jnp.any(finite, axis=1))):
        raise RuntimeError(
            "no finite-potential init found for some leave-one-out catalog "
            f"in {n_cand} prior draws"
        )
    idx = jnp.argmax(finite, axis=1)
    theta0 = jnp.take_along_axis(cands, idx[:, None, None], axis=1)[:, 0]

    progress = None
    if verbose:

        def progress(phase, done, total):
            if done % 100 == 0 or done == total:
                print(f"[loo/fleet] {phase} {done}/{total}", flush=True)

    res = fleet_fit(
        make_pot, datas, theta0, k_fit,
        num_warmup=num_warmup, num_samples=num_samples, progress=progress,
        cfg=cfg or NutsConfig(), chunk_size=chunk_size,
    )
    thetas = np.asarray(res.thetas)
    if not np.all(np.isfinite(thetas)):
        raise RuntimeError("non-finite draws in the leave-one-out fleet")
    post = {k: np.asarray(v) for k, v in constrain(spec, res.thetas).items()}
    return LooResult(posterior=post, accept=np.asarray(res.accept), eps=np.asarray(res.eps))


def influence_summary(
    loo: LooResult, full_posterior: Dict[str, np.ndarray]
) -> Dict[str, Dict[str, np.ndarray]]:
    """Per-site influence of each event, in full-posterior-sd units.

    ``full_posterior``: site -> (chains, draws) from the full-catalog fit.
    Returns site -> {"mean_loo": (nobs,), "delta_mean": (nobs,), "z": (nobs,)}
    for every scalar site present in both inputs.
    """
    out = {}
    for site, loo_draws in loo.posterior.items():
        if site not in full_posterior or np.ndim(loo_draws) != 2:
            continue
        full = np.asarray(full_posterior[site])
        if full.ndim != 2:
            continue
        mu, sd = float(np.mean(full)), float(np.std(full))
        mean_loo = loo_draws.mean(axis=1)
        delta = mean_loo - mu
        out[site] = {
            "mean_loo": mean_loo,
            "delta_mean": delta,
            "z": delta / (sd if sd > 0 else np.inf),
        }
    return out
