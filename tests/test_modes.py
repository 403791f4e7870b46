"""Multimodality machinery: mode assignment, per-mode R-hat, bridge weights.

Ground truth comes from a synthetic 2-Gaussian mixture in 3 dimensions whose
mode weights are set by an explicit log-amplitude offset: chains started in
either basin cannot cross (the basins sit ~20 sd apart), which is exactly
the PLPeak flagship situation the machinery exists for.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.inference.distributions import Normal
from bumpcosmology_tpu.inference.model import ModelSpec, make_potential
from bumpcosmology_tpu.inference.modes import (
    assign_modes,
    mode_weighted_resample,
    mode_weights_by_bridge,
    split_rhat_per_mode,
)

DIM = 3
SEP = 8.0  # basin separation in units of the basin sd (0.4) => 20 sd
SD = 0.4
LOG_W2 = -2.0  # second mode is e^-2 down in amplitude => weight ~ 0.1192


def _mixture_spec() -> ModelSpec:
    mu1 = jnp.zeros(DIM)
    mu2 = jnp.full(DIM, SEP / math.sqrt(DIM))

    def loglike(sites):
        x = jnp.stack([sites[f"x{i}"] for i in range(DIM)])
        l1 = -0.5 * jnp.sum(((x - mu1) / SD) ** 2)
        l2 = LOG_W2 - 0.5 * jnp.sum(((x - mu2) / SD) ** 2)
        # subtract the broad Normal(0,10) priors' contribution so the
        # normalized posterior is (almost exactly) the two-Gaussian mixture
        return jnp.logaddexp(l1, l2)

    return ModelSpec(
        priors={f"x{i}": Normal(0.0, 10.0) for i in range(DIM)},
        loglike=loglike,
    )


@pytest.fixture(scope="module")
def bimodal_fit():
    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_sampling, run_warmup
    from bumpcosmology_tpu.inference.sampler import _finite_prior_init

    spec = _mixture_spec()
    potential = make_potential(spec)
    n_chains = 8
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # start the chains near alternating basins: dispersed inits, no
    # hand-seeding of the dominant mode (the machinery must sort it out)
    theta0 = np.tile(np.array([[0.0], [SEP / math.sqrt(DIM)]]), (4, DIM))[:n_chains]
    theta0 = jnp.asarray(theta0 + 0.3 * np.random.default_rng(5).standard_normal((n_chains, DIM)))
    warm, _ = run_warmup(potential, theta0, k1, 400, NutsConfig())
    thetas, _, _ = run_sampling(potential, warm, k2, 500, NutsConfig())
    post = {
        f"x{i}": np.asarray(thetas[:, :, i]) for i in range(DIM)
    }  # (chains, draws) per site
    return spec, post


def test_assign_modes_finds_two_basins(bimodal_fit):
    _, post = bimodal_fit
    labels = assign_modes(post)
    assert len(np.unique(labels)) == 2
    # labels ordered by size; the mixture is even-split by construction of
    # the inits (4 chains each)
    assert sorted(np.bincount(labels).tolist(), reverse=True) == [4, 4]


def test_per_mode_rhat_converged_within_modes(bimodal_fit):
    _, post = bimodal_fit
    labels = assign_modes(post)
    diag = split_rhat_per_mode(post, labels)
    for m, d in diag.items():
        assert d["max_rhat"] < 1.02, f"mode {m} not converged: {d}"
        assert d["min_ess"] > 100.0
    # sanity: cross-mode (global) rhat is terrible, which is WHY the
    # per-mode diagnostic exists
    from bumpcosmology_tpu.inference.diagnostics import split_rhat

    assert split_rhat(post["x0"]) > 1.5


def test_bridge_mode_weights_match_analytic(bimodal_fit):
    spec, post = bimodal_fit
    labels = assign_modes(post)
    weights, results = mode_weights_by_bridge(spec, post, labels, seed=3)
    assert all(r is not None for r in results)
    # analytic: both basins have equal covariance; the prior is flat across
    # the two basin locations up to N(0,10) curvature, so
    # w2/w1 ~ exp(LOG_W2 + dlogprior), dlogprior = sum_i [logN(mu2_i;0,10) -
    # logN(0;0,10)] = -0.5 * SEP^2/100
    target_ratio = math.exp(LOG_W2 - 0.5 * SEP**2 / 100.0)
    got_ratio = weights[1] / weights[0] if weights[0] >= weights[1] else weights[0] / weights[1]
    assert got_ratio == pytest.approx(target_ratio, rel=0.25), (
        f"bridge weight ratio {got_ratio:.4f} vs analytic {target_ratio:.4f}"
    )

    resampled = mode_weighted_resample(
        post, labels, weights, 4000, np.random.default_rng(0)
    )
    frac_mode2 = float(np.mean(resampled["x0"][0] > SEP / (2 * math.sqrt(DIM))))
    w2 = target_ratio / (1.0 + target_ratio)
    assert frac_mode2 == pytest.approx(w2, abs=0.03)
