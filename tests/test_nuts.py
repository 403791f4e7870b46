"""NUTS sampler validation on analytically known targets."""
import math

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as ss

from bumpcosmology_tpu.inference.diagnostics import ess, split_rhat, summary
from bumpcosmology_tpu.inference.distributions import Normal, TruncatedNormal, Uniform
from bumpcosmology_tpu.inference.model import ModelSpec, constrain, make_potential, prior_sample
from bumpcosmology_tpu.inference.nuts import NutsConfig, run_nuts, warmup_schedule


def test_warmup_schedule_structure():
    segments = warmup_schedule(1000)
    lengths = [n for n, _ in segments]
    updates = [u for _, u in segments]
    assert sum(lengths) == 1000
    # fast init buffer and terminal buffer do not update the mass matrix
    assert updates[0] is False and updates[-1] is False
    # doubling slow windows in between, each ending with a mass update
    assert all(updates[1:-1])
    assert lengths[1:-1] == [25, 50, 100, 200, 500]
    # degenerate short warmup
    assert warmup_schedule(10) == [(10, False)]


def test_standard_gaussian_recovery():
    dim = 3

    def potential(theta):
        return 0.5 * jnp.sum(theta**2)

    key = jax.random.PRNGKey(0)
    theta0 = jax.random.normal(key, (4, dim)) * 0.5
    samples, stats, warm, _ = run_nuts(
        potential, theta0, jax.random.PRNGKey(1), num_warmup=400, num_samples=600
    )
    x = np.asarray(samples)  # (4, 600, 3)
    assert np.all(np.isfinite(x))
    assert np.asarray(stats.diverging).mean() < 0.02
    for d in range(dim):
        assert abs(x[..., d].mean()) < 0.1
        assert abs(x[..., d].std() - 1.0) < 0.1
        assert split_rhat(x[..., d]) < 1.05
        assert ess(x[..., d]) > 200


def test_correlated_gaussian_dense_mass():
    rho = 0.9
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]])).astype(np.float32)

    def potential(theta):
        return 0.5 * theta @ jnp.asarray(prec) @ theta

    theta0 = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    samples, stats, warm, _ = run_nuts(
        potential, theta0, jax.random.PRNGKey(3), num_warmup=500, num_samples=800
    )
    x = np.asarray(samples).reshape(-1, 2)
    emp = np.cov(x.T)
    np.testing.assert_allclose(emp[0, 0], 1.0, atol=0.15)
    np.testing.assert_allclose(emp[0, 1], rho, atol=0.15)
    # the adapted mass-matrix inverse should approximate the target covariance
    cov_hat = np.asarray(warm.cov)[0]
    np.testing.assert_allclose(cov_hat[0, 1] / np.sqrt(cov_hat[0, 0] * cov_hat[1, 1]), rho, atol=0.2)


def test_badly_scaled_gaussian():
    scales = jnp.asarray([0.1, 10.0])

    def potential(theta):
        return 0.5 * jnp.sum((theta / scales) ** 2)

    theta0 = jax.random.normal(jax.random.PRNGKey(4), (2, 2))
    samples, stats, _, _ = run_nuts(
        potential, theta0, jax.random.PRNGKey(5), num_warmup=500, num_samples=600
    )
    x = np.asarray(samples)
    assert abs(x[..., 0].std() - 0.1) < 0.03
    assert abs(x[..., 1].std() - 10.0) < 3.0


@pytest.mark.slow
def test_prior_only_model_recovers_truncnorm():
    """Transforms + Jacobians end-to-end: sampling a prior-only ModelSpec must
    reproduce the prior (the NUTS-side analogue of numpyro's biject_to)."""
    priors = {
        "tn2": TruncatedNormal(2.35, 2.0, low=-1.65, high=6.35),
        "tn1": TruncatedNormal(2.0, 2.0, low=1.0),
        "u": Uniform(math.log(1e-3), math.log(0.5)),
        "n": Normal(0.0, 1.0),
    }
    spec = ModelSpec(priors=priors, loglike=lambda sites: jnp.asarray(0.0))
    pot = make_potential(spec)
    theta0 = jax.vmap(lambda k: prior_sample(spec, k))(jax.random.split(jax.random.PRNGKey(6), 4))
    samples, stats, _, _ = run_nuts(pot, theta0, jax.random.PRNGKey(7), num_warmup=500, num_samples=1000)
    sites = constrain(spec, jnp.asarray(samples))

    tn2 = np.asarray(sites["tn2"]).reshape(-1)
    a, b = (-1.65 - 2.35) / 2.0, (6.35 - 2.35) / 2.0
    ref2 = ss.truncnorm(a, b, loc=2.35, scale=2.0)
    assert abs(tn2.mean() - ref2.mean()) < 0.1
    assert abs(tn2.std() - ref2.std()) < 0.1

    tn1 = np.asarray(sites["tn1"]).reshape(-1)
    ref1 = ss.truncnorm((1.0 - 2.0) / 2.0, np.inf, loc=2.0, scale=2.0)
    assert abs(tn1.mean() - ref1.mean()) < 0.12
    assert abs(tn1.std() - ref1.std()) < 0.12

    u = np.asarray(sites["u"]).reshape(-1)
    lo, hi = math.log(1e-3), math.log(0.5)
    assert abs(u.mean() - 0.5 * (lo + hi)) < 0.15
    assert u.min() > lo and u.max() < hi

    n = np.asarray(sites["n"]).reshape(-1)
    assert abs(n.mean()) < 0.1 and abs(n.std() - 1.0) < 0.1


def test_reproducible_with_fixed_seed():
    def potential(theta):
        return 0.5 * jnp.sum(theta**2)

    theta0 = jnp.zeros((2, 2)) + 0.1
    s1, _, _, _ = run_nuts(potential, theta0, jax.random.PRNGKey(8), num_warmup=100, num_samples=50)
    s2, _, _, _ = run_nuts(potential, theta0, jax.random.PRNGKey(8), num_warmup=100, num_samples=50)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_summary_and_diagnostics_api():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 500))
    s = summary({"x": x})["x"]
    assert abs(s["mean"]) < 0.1
    assert 0.9 < s["sd"] < 1.1
    assert s["rhat"] < 1.02
    assert s["ess"] > 1000  # iid draws


def test_shared_mass_pooling():
    """Pooled Welford must equal the covariance of the concatenated draws."""
    from bumpcosmology_tpu.inference.nuts import (
        _batched_welford_init,
        _pool_welford,
        _welford_cov,
        _welford_update,
    )

    rng = np.random.default_rng(0)
    nchains, n, dim = 4, 200, 3
    draws = rng.multivariate_normal(
        np.zeros(dim), [[1, 0.5, 0], [0.5, 2, 0.3], [0, 0.3, 0.5]], size=(nchains, n)
    ).astype(np.float32)

    wf = _batched_welford_init(nchains, dim, jnp.float32)
    for t in range(n):
        wf = jax.vmap(_welford_update)(wf, jnp.asarray(draws[:, t]))
    pooled = _pool_welford(wf)
    cov_pooled = np.asarray(_welford_cov(jax.tree.map(lambda x: x[0], pooled), regularize=False))
    cov_np = np.cov(draws.reshape(-1, dim).T)
    np.testing.assert_allclose(cov_pooled, cov_np, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_shared_mass_fit_runs():
    from bumpcosmology_tpu.inference.nuts import NutsConfig, run_nuts

    rho = 0.8
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]])).astype(np.float32)

    def potential(theta):
        return 0.5 * theta @ jnp.asarray(prec) @ theta

    theta0 = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    samples, stats, warm, _ = run_nuts(
        potential, theta0, jax.random.PRNGKey(1),
        num_warmup=300, num_samples=300, cfg=NutsConfig(shared_mass=True),
    )
    x = np.asarray(samples).reshape(-1, 2)
    emp = np.cov(x.T)
    np.testing.assert_allclose(emp[0, 1], rho, atol=0.15)
    # all chains share one mass matrix
    cov = np.asarray(warm.cov)
    np.testing.assert_allclose(cov[0], cov[1], rtol=1e-6)


def test_finite_prior_init_redraws():
    """Chains must never initialize where the potential is infinite."""
    from bumpcosmology_tpu.inference.sampler import _finite_prior_init
    from bumpcosmology_tpu.inference.model import make_potential

    priors = {"x": Normal(0.0, 1.0)}
    # zero likelihood on half the prior mass
    spec = ModelSpec(
        priors=priors,
        loglike=lambda s: jnp.where(s["x"] > 0.0, -jnp.inf, 0.0),
    )
    pot = make_potential(spec)
    theta = _finite_prior_init(spec, pot, jax.random.PRNGKey(0), num_chains=16)
    u = jax.vmap(pot)(theta)
    assert np.all(np.isfinite(np.asarray(u)))
    assert np.all(np.asarray(theta)[:, 0] <= 0.0)


@pytest.mark.slow
def test_chees_hmc_gaussian_recovery():
    """ChEES-HMC: correct moments + adapted trajectory on a correlated Gaussian."""
    from bumpcosmology_tpu.inference.chees import CheesConfig, run_chees

    rho = 0.7
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]])).astype(np.float32)

    def potential(theta):
        return 0.5 * theta @ jnp.asarray(prec) @ theta

    theta0 = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    res = run_chees(potential, theta0, jax.random.PRNGKey(1), num_warmup=400, num_samples=400)
    x = np.asarray(res.thetas).reshape(-1, 2)
    emp = np.cov(x.T)
    np.testing.assert_allclose(emp[0, 0], 1.0, atol=0.2)
    np.testing.assert_allclose(emp[0, 1], rho, atol=0.2)
    assert 0.4 < float(np.asarray(res.accept).mean()) <= 1.0
    assert res.n_leapfrog >= 1
    assert np.isfinite(float(res.trajectory_length))


def test_chees_from_warmup_gaussian_recovery():
    """NUTS warmup -> warm-started ChEES (T-only adaptation, jittered
    sampling) recovers the target moments with the NUTS mass matrix."""
    from bumpcosmology_tpu.inference.chees import run_chees_from_warmup
    from bumpcosmology_tpu.inference.nuts import run_warmup, NutsConfig

    rho = 0.7
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]])).astype(np.float32)

    def potential(theta):
        return 0.5 * theta @ jnp.asarray(prec) @ theta

    theta0 = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    warm, _ = run_warmup(potential, theta0, jax.random.PRNGKey(1), 300, NutsConfig())
    res = run_chees_from_warmup(
        potential, warm, jax.random.PRNGKey(2), num_adapt=100, num_samples=300
    )
    x = np.asarray(res.thetas).reshape(-1, 2)
    emp = np.cov(x.T)
    np.testing.assert_allclose(emp[0, 0], 1.0, atol=0.2)
    np.testing.assert_allclose(emp[0, 1], rho, atol=0.2)
    assert 0.4 < float(np.asarray(res.accept).mean()) <= 1.0
    assert res.n_leapfrog >= 1
    # adaptation touched T but kept the NUTS kernel's eps
    np.testing.assert_allclose(float(res.eps), float(np.asarray(warm.eps)[0]))


@pytest.mark.slow
def test_fit_with_chees_sampler():
    from bumpcosmology_tpu.inference.sampler import fit
    from bumpcosmology_tpu.testing import synthetic_pop_data
    from bumpcosmology_tpu.inference.likelihoods import pop_model_spec

    data = synthetic_pop_data(nobs=4, nsamp=16, nsel=32, seed=0)
    spec = pop_model_spec(data, n_grid=64)
    res = fit(
        spec, jax.random.PRNGKey(0), num_warmup=50, num_samples=30,
        num_chains=4, sampler="chees", verbose=False,
    )
    assert res.posterior["a"].shape == (4, 30)
    assert np.isfinite(res.posterior["a"]).all()
    assert 0.0 < res.sample_stats["accept_prob"].mean() <= 1.0


def test_fit_with_hybrid_nuts_chees_sampler():
    """sampler='nuts+chees': NUTS windowed warmup, then T-only ChEES
    adaptation and fixed-length jittered sampling — the production TPU
    configuration (ragged-tree-free sampling phase)."""
    from bumpcosmology_tpu.inference.sampler import fit

    priors = {
        "x": Normal(0.0, 1.0),
        "y": TruncatedNormal(1.0, 2.0, low=0.0),
    }
    spec = ModelSpec(priors=priors, loglike=lambda sites: jnp.asarray(0.0))
    res = fit(
        spec, jax.random.PRNGKey(11), num_warmup=300, num_samples=300,
        num_chains=4, sampler="nuts+chees", chees_num_adapt=50, verbose=False,
    )
    x = res.posterior["x"]
    assert x.shape == (4, 300)
    assert np.isfinite(x).all()
    assert abs(x.mean()) < 0.2 and abs(x.std() - 1.0) < 0.2
    assert 0.4 < res.sample_stats["accept_prob"].mean() <= 1.0
    assert "n_leapfrog" in res.sample_stats
    # fixed-length HMC reports energy-error divergences like NUTS does
    assert res.sample_stats["diverging"].shape == (4, 300)
    assert res.sample_stats["diverging"].sum() == 0
    # the hybrid's final state reuses the NUTS mass matrix (shared kernel)
    assert res.final_state.cov.shape == res.warmup_state.cov.shape


def test_sampling_checkpoint_resume(tmp_path):
    """Mid-sampling crash recovery: interrupting after a persisted chunk and
    re-running produces exactly the draws of an uninterrupted run."""
    from bumpcosmology_tpu.inference.nuts import WarmupResult, run_sampling, _sampling_ckpt_file

    def potential(theta):
        return 0.5 * jnp.sum(theta**2)

    dim, nchains = 2, 3
    theta0 = jax.random.normal(jax.random.PRNGKey(0), (nchains, dim))
    u, grad = jax.vmap(jax.value_and_grad(potential))(theta0)
    from bumpcosmology_tpu.inference.nuts import ChainState

    warm = WarmupResult(
        state=ChainState(theta=theta0, u=u, grad=grad),
        eps=jnp.full((nchains,), 0.5),
        cov=jnp.broadcast_to(jnp.eye(dim), (nchains, dim, dim)),
        chol_cov=jnp.broadcast_to(jnp.eye(dim), (nchains, dim, dim)),
    )
    key = jax.random.PRNGKey(7)
    ckpt = str(tmp_path / "fitckpt")

    full, full_stats, _ = run_sampling(potential, warm, key, 40, chunk_size=5)

    # interrupted run: stop after 20 draws (4 chunks, checkpoint_every=2)
    n_done = 0
    orig_exists = None

    class _Stop(Exception):
        pass

    def progress(done, total):
        nonlocal n_done
        n_done = done
        if done >= 20:
            raise _Stop

    try:
        run_sampling(
            potential, warm, key, 40, chunk_size=5, progress=progress,
            checkpoint_path=ckpt, checkpoint_every=2,
        )
    except _Stop:
        pass
    import os

    assert os.path.exists(_sampling_ckpt_file(ckpt)), "chunk checkpoint not written"

    resumed, resumed_stats, _ = run_sampling(
        potential, warm, key, 40, chunk_size=5, checkpoint_path=ckpt, checkpoint_every=2,
    )
    np.testing.assert_array_equal(np.asarray(resumed), np.asarray(full))
    np.testing.assert_array_equal(
        np.asarray(resumed_stats.accept_prob), np.asarray(full_stats.accept_prob)
    )
    assert not os.path.exists(_sampling_ckpt_file(ckpt)), "checkpoint not cleaned up"


def test_checkpoint_path_without_npz_suffix_resumes(tmp_path):
    """fit(checkpoint_path='x.ckpt') must resume even though np.savez writes
    x.ckpt.npz (round-1 bug: the existence check used the raw path)."""
    from bumpcosmology_tpu.utils.checkpoint import checkpoint_file, load_warmup, save_warmup
    from bumpcosmology_tpu.inference.nuts import ChainState, WarmupResult
    import os

    path = str(tmp_path / "warm.ckpt")  # no .npz suffix
    dim, nchains = 2, 3
    theta = jnp.zeros((nchains, dim))
    warm = WarmupResult(
        state=ChainState(theta=theta, u=jnp.zeros(nchains), grad=theta),
        eps=jnp.full((nchains,), 0.1),
        cov=jnp.broadcast_to(jnp.eye(dim), (nchains, dim, dim)),
        chol_cov=jnp.broadcast_to(jnp.eye(dim), (nchains, dim, dim)),
    )
    save_warmup(path, warm)
    assert os.path.exists(checkpoint_file(path))
    loaded = load_warmup(path)
    np.testing.assert_array_equal(np.asarray(loaded.eps), np.asarray(warm.eps))
