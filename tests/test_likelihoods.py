"""L2 likelihood + prior tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as ss

from bumpcosmology_tpu.inference.distributions import Normal, TruncatedNormal, Uniform
from bumpcosmology_tpu.inference.likelihoods import (
    POP_COSMO_PRIORS,
    POP_PRIORS,
    make_pop_cosmo_data,
    make_pop_data,
    pop_cosmo_deterministics,
    pop_cosmo_model_spec,
    pop_deterministics,
    pop_model_spec,
)
from bumpcosmology_tpu.inference.model import (
    constrain,
    make_potential,
    prior_sample,
    unconstrain,
)
from bumpcosmology_tpu.models import PLANCK18, dl_at_z, planck18_table


# -------------------------------------------------------------- distributions


def test_normal_logprob_matches_scipy():
    d = Normal(1.5, 2.0)
    x = np.linspace(-5, 8, 13)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), ss.norm(1.5, 2.0).logpdf(x), rtol=1e-5
    )


def test_truncnorm_logprob_matches_scipy():
    d = TruncatedNormal(2.35, 2.0, low=-1.65, high=6.35)
    a, b = (-1.65 - 2.35) / 2.0, (6.35 - 2.35) / 2.0
    x = np.linspace(-1.5, 6.3, 11)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        ss.truncnorm(a, b, loc=2.35, scale=2.0).logpdf(x),
        rtol=1e-4,
    )
    assert float(d.log_prob(jnp.asarray(-2.0))) == -np.inf


def test_truncnorm_onesided_matches_scipy():
    d = TruncatedNormal(2.0, 2.0, low=1.0)
    a = (1.0 - 2.0) / 2.0
    x = np.linspace(1.1, 9.0, 9)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        ss.truncnorm(a, np.inf, loc=2.0, scale=2.0).logpdf(x),
        rtol=1e-4,
    )


def test_uniform_logprob():
    d = Uniform(math.log(1e-3), math.log(0.5))
    w = math.log(0.5) - math.log(1e-3)
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(-3.0))), -math.log(w), rtol=1e-4)
    assert float(d.log_prob(jnp.asarray(0.0))) == -np.inf


def test_bijections_roundtrip_and_jacobian():
    dists = [
        Normal(0.0, 2.0),
        Uniform(-1.0, 3.0),
        TruncatedNormal(2.0, 2.0, low=1.0),
        TruncatedNormal(0.0, 1.0, low=-2.0, high=2.0),
    ]
    for d in dists:
        x = 1.7 if not isinstance(d, Uniform) else 0.3
        u = float(d.unconstrain(jnp.asarray(x)))
        back = float(d.constrain(jnp.asarray(u)))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)
        # log|dx/du| vs autodiff
        jac = float(jax.grad(lambda uu: d.constrain(uu))(jnp.asarray(u)))
        np.testing.assert_allclose(
            float(d.constrain_log_jac(jnp.asarray(u))), math.log(abs(jac)), rtol=1e-4
        )


def test_truncnorm_sampling_moments():
    d = TruncatedNormal(2.35, 2.0, low=-1.65, high=6.35)
    key = jax.random.PRNGKey(0)
    x = np.asarray(d.sample(key, (200_000,)))
    a, b = (-1.65 - 2.35) / 2.0, (6.35 - 2.35) / 2.0
    ref = ss.truncnorm(a, b, loc=2.35, scale=2.0)
    assert abs(x.mean() - ref.mean()) < 0.02
    assert abs(x.std() - ref.std()) < 0.02
    assert x.min() >= -1.65 and x.max() <= 6.35


# ------------------------------------------------------------ synthetic data


def _synthetic_source_frame(nobs=6, nsamp=24, nsel=64, seed=7):
    rng = np.random.default_rng(seed)
    m1 = rng.uniform(8.0, 70.0, size=(nobs, nsamp))
    q = rng.uniform(0.3, 1.0, size=(nobs, nsamp))
    z = rng.uniform(0.02, 1.5, size=(nobs, nsamp))
    pdraw = rng.uniform(0.5, 2.0, size=(nobs, nsamp))
    m1_s = rng.uniform(8.0, 70.0, size=nsel)
    q_s = rng.uniform(0.3, 1.0, size=nsel)
    z_s = rng.uniform(0.02, 1.5, size=nsel)
    pd_s = rng.uniform(0.5, 2.0, size=nsel)
    return m1, q, z, pdraw, m1_s, q_s, z_s, pd_s


def _pop_data():
    m1, q, z, pd, m1s, qs, zs, pds = _synthetic_source_frame()
    return make_pop_data(m1, q, z, pd, m1s, qs, zs, pds, ndraw=1000.0)


def _pop_cosmo_data():
    m1, q, z, pd, m1s, qs, zs, pds = _synthetic_source_frame()
    table = planck18_table()
    dl = np.asarray(dl_at_z(table, jnp.asarray(z)))
    dls = np.asarray(dl_at_z(table, jnp.asarray(zs)))
    m1d = m1 * (1 + z)
    m1ds = m1s * (1 + zs)
    return make_pop_cosmo_data(m1d, q, dl, pd, m1ds, qs, dls, pds, ndraw=1000.0)


# ----------------------------------------------------------------- pop model


def test_pop_potential_finite_and_differentiable():
    data = _pop_data()
    spec = pop_model_spec(data)
    pot = make_potential(spec)
    theta = prior_sample(spec, jax.random.PRNGKey(1))
    v, g = jax.value_and_grad(pot)(theta)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    assert theta.shape == (spec.dim,) == (12,)


def test_pop_cosmo_potential_finite_and_differentiable():
    data = _pop_cosmo_data()
    spec = pop_cosmo_model_spec(data)
    pot = make_potential(spec)
    theta = prior_sample(spec, jax.random.PRNGKey(2))
    v, g = jax.value_and_grad(jax.jit(pot))(theta)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    assert spec.dim == 15


def test_pop_loglike_sample_permutation_invariant():
    data = _pop_data()
    spec = pop_model_spec(data)
    theta = prior_sample(spec, jax.random.PRNGKey(3))
    sites = constrain(spec, theta)
    from bumpcosmology_tpu.inference.likelihoods import pop_loglike

    base = float(pop_loglike(sites, data))
    rng = np.random.default_rng(0)
    perm = rng.permutation(data.events.a.shape[1])
    ev = data.events._replace(
        a=data.events.a[:, perm],
        q=data.events.q[:, perm],
        c=data.events.c[:, perm],
        log_pdraw=data.events.log_pdraw[:, perm],
    )
    permuted = float(pop_loglike(sites, data._replace(events=ev)))
    np.testing.assert_allclose(permuted, base, rtol=1e-5)


def test_constrain_unconstrain_roundtrip():
    data = _pop_data()
    spec = pop_model_spec(data)
    theta = prior_sample(spec, jax.random.PRNGKey(4))
    sites = constrain(spec, theta)
    theta2 = unconstrain(spec, sites)
    np.testing.assert_allclose(np.asarray(theta2), np.asarray(theta), rtol=1e-3, atol=1e-4)


def test_pop_deterministics_shapes():
    data = _pop_data()
    spec = pop_model_spec(data)
    sites = constrain(spec, prior_sample(spec, jax.random.PRNGKey(5)))
    det = pop_deterministics(sites, data)
    nobs = data.events.a.shape[0]
    assert det["neff"].shape == (nobs,)
    assert det["mdNdmdVdt_fixed_qz"].shape == (128,)
    assert det["dNdqdVdt_fixed_mz"].shape == (128,)
    assert det["dNdVdt_fixed_mq"].shape == (128,)
    assert np.isfinite(float(det["neff_sel"]))
    assert np.all(np.asarray(det["neff"]) > 0)
    assert np.isfinite(float(det["R"]))


def test_pop_cosmo_deterministics_has_hz():
    data = _pop_cosmo_data()
    spec = pop_cosmo_model_spec(data)
    sites = constrain(spec, prior_sample(spec, jax.random.PRNGKey(6)))
    det = pop_cosmo_deterministics(sites, data)
    assert det["hz"].shape == (128,)
    # hz at z=0 is just h
    np.testing.assert_allclose(float(det["hz"][0]), float(sites["h"]), rtol=1e-4)


def test_prior_site_count_parity():
    # 8 mass + 3 redshift + 1 rate = 12 (pop); +3 cosmo = 15 (pop_cosmo),
    # matching ``intensity_models.py:281-311,328-330,348,368-372``.
    assert len(POP_PRIORS) == 12
    assert len(POP_COSMO_PRIORS) == 15


@pytest.mark.slow
def test_fused_detector_table_matches_per_lookup_path():
    """pop_cosmo_loglike with dl_bounds (fused log-dL-keyed table) agrees with
    the per-lookup formulation at interp-discretization tolerance, for value
    and gradient, across prior draws."""
    import jax

    from bumpcosmology_tpu.inference.likelihoods import dl_bounds_of, pop_cosmo_loglike
    from bumpcosmology_tpu.inference.model import constrain, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_cosmo_data

    data = synthetic_pop_cosmo_data(nobs=8, nsamp=32, nsel=128, seed=3)
    spec = pop_cosmo_model_spec(data)
    bounds = dl_bounds_of(data)

    def old(theta):
        return pop_cosmo_loglike(constrain(spec, theta), data, 128, 512, None)

    def new(theta):
        return pop_cosmo_loglike(constrain(spec, theta), data, 128, 512, bounds)

    vg_old = jax.jit(jax.value_and_grad(old))
    vg_new = jax.jit(jax.value_and_grad(new))
    for s in range(4):
        theta = prior_sample(spec, jax.random.PRNGKey(100 + s))
        v_old, g_old = vg_old(theta)
        v_new, g_new = vg_new(theta)
        assert np.isfinite(float(v_new))
        # discretization difference of the re-keyed table: O(1e-5) relative
        np.testing.assert_allclose(float(v_new), float(v_old), rtol=5e-4, atol=5e-2)
        np.testing.assert_allclose(
            np.asarray(g_new), np.asarray(g_old), rtol=0.05, atol=0.05
        )
