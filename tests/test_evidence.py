"""Bridge-sampling evidence: pinned against conjugate-normal analytic log Z.

The estimator (``inference/evidence.py``) is validated the same way the
prior-sensitivity and LOO machinery are (``tests/test_prior_sens.py``,
``tests/test_model_compare.py``): on a model whose marginal likelihood has a
closed form, with the posterior sampled *exactly* (no MCMC), so any estimator
error is the estimator's own.
"""
import math

import numpy as np
import pytest
from scipy import stats

from bumpcosmology_tpu.inference.distributions import Normal, Uniform
from bumpcosmology_tpu.inference.evidence import (
    bayes_factor_table,
    log_evidence_bridge,
)
from bumpcosmology_tpu.inference.model import ModelSpec


def _normal_normal_spec(y, sigma, mu0, tau):
    """d independent Normal(mu0, tau) priors, Normal(y_i | x_i, sigma) likelihood."""
    d = len(y)
    priors = {f"x{i}": Normal(mu0, tau) for i in range(d)}
    y = np.asarray(y)

    def loglike(sites):
        total = 0.0
        for i in range(d):
            total = total - 0.5 * ((y[i] - sites[f"x{i}"]) / sigma) ** 2 - 0.5 * math.log(
                2.0 * math.pi * sigma**2
            )
        return total

    return ModelSpec(priors=priors, loglike=loglike)


def test_bridge_recovers_conjugate_normal_evidence():
    rng = np.random.default_rng(7)
    d, sigma, mu0, tau = 6, 0.7, 0.5, 2.0
    y = rng.normal(0.0, 1.5, size=d)
    spec = _normal_normal_spec(y, sigma, mu0, tau)

    # Exact evidence: each dim contributes N(y_i | mu0, sqrt(tau^2 + sigma^2)).
    log_z_true = float(
        np.sum(stats.norm.logpdf(y, loc=mu0, scale=math.sqrt(tau**2 + sigma**2)))
    )

    # Exact posterior: Normal(post_mean_i, post_sd) per dim — sampled directly.
    post_var = 1.0 / (1.0 / tau**2 + 1.0 / sigma**2)
    post_mean = post_var * (mu0 / tau**2 + y / sigma**2)
    n = 4096
    draws = post_mean + math.sqrt(post_var) * rng.standard_normal((n, d))
    posterior = {f"x{i}": draws[:, i].reshape(1, n) for i in range(d)}

    res = log_evidence_bridge(spec, posterior, seed=11)
    assert res.converged
    err = abs(res.log_z - log_z_true)
    assert err < 0.05, f"logZ {res.log_z:.4f} vs true {log_z_true:.4f}"
    assert err < 4.0 * max(res.se, 1e-3)
    assert res.se < 0.05


def test_bridge_handles_bounded_priors_via_unconstrained_space():
    """Uniform priors: the Jacobian and the out-of-support proposal draws
    (floored to zero weight) must both be handled; analytic truncated-normal
    evidence pins the answer."""
    rng = np.random.default_rng(3)
    d, sigma = 3, 0.5
    lo, hi = -1.0, 3.0
    y = np.array([0.2, 1.1, 2.7])
    priors = {f"x{i}": Uniform(lo, hi) for i in range(d)}

    def loglike(sites):
        total = 0.0
        for i in range(d):
            total = total - 0.5 * ((y[i] - sites[f"x{i}"]) / sigma) ** 2 - 0.5 * math.log(
                2.0 * math.pi * sigma**2
            )
        return total

    spec = ModelSpec(priors=priors, loglike=loglike)

    # Z = prod_i [Phi((hi-y_i)/sigma) - Phi((lo-y_i)/sigma)] / (hi-lo)
    log_z_true = float(
        np.sum(
            np.log(
                stats.norm.cdf((hi - y) / sigma) - stats.norm.cdf((lo - y) / sigma)
            )
            - math.log(hi - lo)
        )
    )

    # Exact posterior: truncated normal centered at y_i.
    n = 4096
    a, b = (lo - y) / sigma, (hi - y) / sigma
    draws = np.stack(
        [
            stats.truncnorm.rvs(a[i], b[i], loc=y[i], scale=sigma, size=n, random_state=rng)
            for i in range(d)
        ],
        axis=1,
    )
    posterior = {f"x{i}": draws[:, i].reshape(1, n) for i in range(d)}

    res = log_evidence_bridge(spec, posterior, seed=5)
    assert res.converged
    err = abs(res.log_z - log_z_true)
    assert err < 0.08, f"logZ {res.log_z:.4f} vs true {log_z_true:.4f}"
    assert err < 4.0 * max(res.se, 1e-3)


def test_bayes_factor_table_ranks_and_formats():
    from bumpcosmology_tpu.inference.evidence import EvidenceResult

    mk = lambda lz: EvidenceResult(  # noqa: E731
        log_z=lz, se=0.01, n_posterior=100, n_proposal=100, n_iter=5,
        converged=True, log_z_blocks=np.zeros(2),
    )
    table = bayes_factor_table({"worse": mk(-10.0), "better": mk(-5.0)})
    lines = table.splitlines()
    assert lines[1].startswith("better")
    assert lines[2].startswith("worse")
    # log10 BF of the worse model vs best: -5/ln(10) ≈ -2.17
    assert "-2.17" in lines[2]


def test_bridge_rejects_nonfinite_posterior_logq():
    spec = _normal_normal_spec([0.0], 1.0, 0.0, 1.0)
    bad = {"x0": np.full((1, 128), np.nan)}
    with pytest.raises(FloatingPointError):
        log_evidence_bridge(spec, bad)
