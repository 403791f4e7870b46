"""PSIS-LOO / WAIC model comparison: estimator correctness + pointwise parity."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.inference.model_compare import (
    compare,
    fit_gpd,
    pointwise_matrix,
    pop_cosmo_pointwise_loglike,
    pop_pointwise_loglike,
    psis_loo,
    waic,
)


def _gpd_sample(rng, k, sigma, n):
    u = rng.uniform(size=n)
    if abs(k) < 1e-12:
        return -sigma * np.log1p(-u)
    return sigma / k * (np.power(1.0 - u, -k) - 1.0)


@pytest.mark.parametrize("k_true", [0.1, 0.4, 0.8])
def test_fit_gpd_recovers_shape(k_true):
    rng = np.random.default_rng(0)
    x = _gpd_sample(rng, k_true, 1.3, 4000)
    k, sigma = fit_gpd(x)
    assert abs(k - k_true) < 0.08
    assert abs(sigma - 1.3) < 0.2


def test_psis_loo_matches_analytic_loo():
    """Conjugate normal–normal: PSIS-LOO must reproduce the exact
    leave-one-out predictive log p(y_i | y_{-i}) within MC error."""
    rng = np.random.default_rng(1)
    n, S = 24, 4000
    mu_true, tau0 = 0.7, 10.0
    y = rng.normal(mu_true, 1.0, size=n)

    # posterior of mu: N(m_post, v_post)
    v_post = 1.0 / (1.0 / tau0**2 + n)
    m_post = v_post * y.sum()
    mus = rng.normal(m_post, math.sqrt(v_post), size=S)

    ll = -0.5 * (y[None, :] - mus[:, None]) ** 2 - 0.5 * math.log(2 * math.pi)
    res = psis_loo(ll)

    # exact LOO predictive: y_i | y_{-i} ~ N(m_i, 1 + v_i)
    elpd_exact = 0.0
    for i in range(n):
        v_i = 1.0 / (1.0 / tau0**2 + (n - 1))
        m_i = v_i * (y.sum() - y[i])
        s2 = 1.0 + v_i
        elpd_exact += -0.5 * math.log(2 * math.pi * s2) - 0.5 * (y[i] - m_i) ** 2 / s2

    assert abs(res.elpd - elpd_exact) < 0.15
    assert np.all(res.khat < 0.7)  # well-specified model: no influential points
    # effective parameter count: E[p_loo] = 1, but the realized value is
    # v_post·Σ(y_i−m)², which fluctuates with the data draw — bound loosely
    assert 0.1 < res.p_loo < 2.5

    w = waic(ll)
    assert abs(w.elpd - elpd_exact) < 0.2
    assert w.p_waic == pytest.approx(res.p_loo, abs=0.05)  # agree when k̂ small


def test_psis_khat_flags_heavy_tail():
    """Importance ratios with an infinite-variance tail must earn k̂ > 0.7."""
    rng = np.random.default_rng(2)
    # log-ratios from a Pareto(alpha=1.2) tail -> k ~ 1/1.2 > 0.7
    lr = np.log(_gpd_sample(rng, 1.0 / 1.2, 1.0, 2000) + 0.1)
    ll = np.stack([-lr, rng.normal(size=2000)], axis=1)
    res = psis_loo(ll)
    assert res.khat[0] > 0.7
    assert res.khat[1] < 0.7


def test_pop_pointwise_sums_to_total():
    from bumpcosmology_tpu.inference.likelihoods import pop_loglike, pop_model_spec
    from bumpcosmology_tpu.inference.model import constrain, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_data

    data = synthetic_pop_data(nobs=5, nsamp=16, nsel=64, seed=3)
    spec = pop_model_spec(data, n_grid=64)
    sites = constrain(spec, prior_sample(spec, jax.random.PRNGKey(0)))
    pw = pop_pointwise_loglike(sites, data, n_grid=64)
    assert pw.shape == (5,)
    np.testing.assert_allclose(
        float(jnp.sum(pw)), float(pop_loglike(sites, data, n_grid=64)), rtol=2e-5
    )


def test_pop_cosmo_pointwise_sums_to_total():
    from bumpcosmology_tpu.inference.likelihoods import (
        dl_bounds_of,
        pop_cosmo_loglike,
        pop_cosmo_model_spec,
    )
    from bumpcosmology_tpu.inference.model import constrain, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_cosmo_data

    data = synthetic_pop_cosmo_data(nobs=5, nsamp=16, nsel=64, seed=4)
    spec = pop_cosmo_model_spec(data, n_grid=64, n_z=256)
    sites = constrain(spec, prior_sample(spec, jax.random.PRNGKey(1)))
    bounds = dl_bounds_of(data)
    pw = pop_cosmo_pointwise_loglike(sites, data, n_grid=64, n_z=256, dl_bounds=bounds)
    assert pw.shape == (5,)
    np.testing.assert_allclose(
        float(jnp.sum(pw)),
        float(pop_cosmo_loglike(sites, data, n_grid=64, n_z=256, dl_bounds=bounds)),
        rtol=2e-5,
    )


def test_pointwise_matrix_thinning_and_padding():
    """Thinning/padding/batching mechanics on a synthetic pointwise fn (the
    real-likelihood integration is covered by
    ``test_pop_pointwise_sums_to_total``; a cheap fn keeps this off the
    compile-bound path)."""
    rng = np.random.default_rng(2)
    posterior = {"x": rng.normal(size=(2, 5)), "y": rng.normal(size=(2, 5))}
    names = ["x", "y"]

    def pointwise(s):
        # (nobs=4,) distinct per-event values, deterministic in the sites
        return jnp.stack([s["x"], 2.0 * s["x"], s["y"], s["x"] - s["y"]])

    ll = pointwise_matrix(pointwise, posterior, names, max_draws=7, batch=3)
    assert ll.shape == (7, 4)
    assert np.isfinite(ll).all()

    # thinning keeps endpoints: row 0 is flat draw 0, row -1 is flat draw -1
    flat = {k: np.asarray(v).reshape(-1) for k, v in posterior.items()}
    np.testing.assert_allclose(
        ll[0], [flat["x"][0], 2 * flat["x"][0], flat["y"][0], flat["x"][0] - flat["y"][0]],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        ll[-1],
        [flat["x"][-1], 2 * flat["x"][-1], flat["y"][-1], flat["x"][-1] - flat["y"][-1]],
        rtol=1e-6,
    )


def test_compare_table_orders_by_elpd():
    rng = np.random.default_rng(6)
    ll_good = rng.normal(-1.0, 0.1, size=(500, 12))
    ll_bad = ll_good - 0.5
    table = compare({"pop": psis_loo(ll_bad), "pop_cosmo": psis_loo(ll_good)})
    lines = table.splitlines()
    assert lines[1].startswith("pop_cosmo")
    assert lines[2].startswith("pop")
    # the worse model's d_elpd is negative
    assert float(lines[2].split()[3]) < 0
