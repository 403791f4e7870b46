"""POWER-LAW+PEAK mass-model family (models/plpeak.py).

Oracle strategy mirrors the bump family's tests: every analytic piece is
checked against an independent float64 scipy/numpy computation, the q-pairing
normalization against adaptive quadrature, and the full intensity against the
framework's own pivot conventions, then spec-level value+gradient health and
a short fit smoke.  (The reference has no PLPeak code — the family is a
beyond-parity addition — so there is no reference formula to cite; the
definitions follow the GWTC-3 fiducial POWER_LAW+PEAK model.)
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.models.mass import MREF
from bumpcosmology_tpu.models.parameters import RedshiftParams
from bumpcosmology_tpu.models.plpeak import (
    DEFAULT_PLPEAK_MASS,
    DEFAULT_PLPEAK_POPULATION,
    M_TAB_HI,
    PLPeakMassParams,
    PLPeakPopulationParams,
    build_plpeak_population,
    log_planck_taper,
    log_pm1_plpeak,
)
from bumpcosmology_tpu.models.population import log_dndmdqdv
from bumpcosmology_tpu.models.redshift import log_dndv


def _taper_np(m, mmin, dm):
    """Planck taper, straight from the defining formula in float64."""
    m = np.asarray(m, dtype=np.float64)
    out = np.zeros_like(m)
    out[m <= mmin] = 0.0
    out[m >= mmin + dm] = 1.0
    mid = (m > mmin) & (m < mmin + dm)
    x = m[mid] - mmin
    with np.errstate(over="ignore"):  # exp overflow near the lower edge is S→0
        out[mid] = 1.0 / (np.exp(dm / x + dm / (x - dm)) + 1.0)
    return out


def test_planck_taper_matches_formula():
    m = np.linspace(3.0, 12.0, 301)
    got = np.exp(np.asarray(log_planck_taper(jnp.asarray(m), 5.0, 4.9)))
    want = _taper_np(m, 5.0, 4.9)
    # exact wherever the true taper is above the e^-8 foot floor ...
    exact = want > 4e-4
    np.testing.assert_allclose(got[exact], want[exact], atol=2e-6, rtol=2e-5)
    # ... and soft-floored (<= e^-8, decreasing, finite) below it
    np.testing.assert_array_less(got[~exact], math.exp(-7.9))
    assert np.all(np.isfinite(np.log(got[~exact])))


def test_planck_taper_monotone_and_edges():
    m = jnp.linspace(5.0 + 1e-4, 9.9 - 1e-4, 200)
    s = np.exp(np.asarray(log_planck_taper(m, 5.0, 4.9)))
    assert np.all(np.diff(s) >= 0)  # f32 saturates at the extreme edges
    interior = (s > 1e-6) & (s < 1.0 - 1e-6)
    assert np.all(np.diff(s[interior]) > 0)
    # below mmin: finite soft foot (−8-nat anchor + FOOT_SLOPE ramp), not −inf
    below = float(log_planck_taper(jnp.asarray(4.999), 5.0, 4.9))
    assert np.isfinite(below) and below < -8.0
    assert float(log_planck_taper(jnp.asarray(9.9), 5.0, 4.9)) == pytest.approx(0.0, abs=1e-6)
    # delta_m = 0 degenerates to an 8-nat soft step at mmin
    assert float(log_planck_taper(jnp.asarray(5.01), 5.0, 0.0)) == 0.0
    below0 = float(log_planck_taper(jnp.asarray(4.99), 5.0, 0.0))
    assert np.isfinite(below0) and below0 < -7.9
    # the soft foot keeps decreasing as m drops (restoring gradient for NUTS)
    assert float(log_planck_taper(jnp.asarray(3.0), 5.0, 4.9)) < below - 5.0


def test_planck_taper_gradients_finite_at_edges():
    def f(mmin, dm):
        m = jnp.asarray([4.0, 5.0, 5.0 + 1e-6, 7.0, 9.899, 9.9, 20.0])
        out = log_planck_taper(m, mmin, dm)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    g = jax.grad(f, argnums=(0, 1))(5.0, 4.9)
    assert all(np.isfinite(float(x)) for x in g)
    g0 = jax.grad(f, argnums=(0, 1))(5.0, 0.0)  # degenerate taper
    assert all(np.isfinite(float(x)) for x in g0)


def test_pm1_power_law_limit():
    """lam_peak → 0 and the taper region below the test range: p(m1) is the
    normalized truncated power law exactly."""
    p = PLPeakMassParams(
        alpha=2.3, beta_q=1.0, mmin=5.0, mmax=60.0, lam_peak=1e-30,
        mu_m=34.0, sigma_m=3.0, delta_m=1.0,
    )
    m = np.linspace(6.5, 59.0, 100)  # above mmin+delta_m, below mmax
    got = np.asarray(log_pm1_plpeak(p, jnp.asarray(m)), dtype=np.float64)
    from scipy.integrate import quad

    norm = quad(lambda x: x**-2.3, 5.0, 60.0)[0]
    want = -2.3 * np.log(m) - np.log(norm)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # mmax soft-truncates the POWER-LAW component only (WALL_SLOPE ramp, not
    # −inf; the Gaussian peak is deliberately NOT truncated there, as in
    # GWTC-3): 1 Msun above mmax costs ≈ WALL_SLOPE nats on the PL piece
    in_support = float(log_pm1_plpeak(p, jnp.asarray(59.0)))
    above = float(log_pm1_plpeak(p, jnp.asarray(61.0)))
    assert np.isfinite(above) and above < in_support - 20.0


def test_pm1_peak_limit():
    """lam_peak → 1: p(m1) is the Gaussian density."""
    p = PLPeakMassParams(
        alpha=2.3, beta_q=1.0, mmin=5.0, mmax=60.0, lam_peak=1.0 - 1e-7,
        mu_m=34.0, sigma_m=3.0, delta_m=1.0,
    )
    m = np.linspace(25.0, 45.0, 50)
    got = np.asarray(log_pm1_plpeak(p, jnp.asarray(m)), dtype=np.float64)
    want = -0.5 * ((m - 34.0) / 3.0) ** 2 - np.log(3.0 * math.sqrt(2 * math.pi))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_pl_norm_stable_through_alpha_one():
    """The expm1 form is smooth through the α = 1 singularity."""
    from bumpcosmology_tpu.models.plpeak import _log_pl_norm_inv

    alphas = jnp.asarray([0.999, 0.9999, 1.0, 1.0001, 1.001])
    vals = np.asarray(_log_pl_norm_inv(alphas, 5.0, 60.0), dtype=np.float64)
    exact = np.log(np.log(60.0 / 5.0))  # ∫ m^-1 dm = log(mmax/mmin)
    np.testing.assert_allclose(vals, exact, atol=5e-3)
    assert np.all(np.isfinite(np.asarray(jax.grad(lambda a: _log_pl_norm_inv(a, 5.0, 60.0))(1.0))))


def test_q_normalization_against_quadrature():
    """N_q(m1) table vs adaptive scipy quadrature of ∫ q^β S(q·m1) dq."""
    from scipy.integrate import quad

    pop = build_plpeak_population(DEFAULT_PLPEAK_POPULATION)
    p = DEFAULT_PLPEAK_MASS
    from bumpcosmology_tpu.ops.interp import interp_unit_spaced

    for m1 in (12.0, 30.0, 55.0, 90.0):
        want = quad(
            lambda q: q**p.beta_q * _taper_np(q * m1, p.mmin, p.delta_m),
            1e-3, 1.0, limit=200,
        )[0]
        got = float(jnp.exp(interp_unit_spaced(jnp.asarray(m1), pop.m_lo, pop.dm, pop.log_nq)))
        np.testing.assert_allclose(got, want, rtol=2e-3)


def test_intensity_pivot_normalization():
    pop = build_plpeak_population(DEFAULT_PLPEAK_POPULATION)
    v = pop.log_dndmdqdv(jnp.asarray(MREF), jnp.asarray(1.0), jnp.asarray(0.0))
    assert float(MREF * jnp.exp(v)) == pytest.approx(1.0, rel=1e-4)


def test_intensity_factorizes():
    """log dN(m1,q,z) − log dN(m1,q,0) must equal the redshift law exactly,
    and the q-dependence at fixed m1 must be q^β·S(q·m1) (both families share
    the generic dispatcher, so this also covers log_dndmdqdv routing)."""
    pop = build_plpeak_population(DEFAULT_PLPEAK_POPULATION)
    m1, q, z = jnp.asarray(40.0), jnp.asarray(0.7), jnp.asarray(1.3)
    dz = float(
        log_dndmdqdv(pop, m1, q, z) - log_dndmdqdv(pop, m1, q, jnp.asarray(0.0))
    )
    want = float(log_dndv(z, DEFAULT_PLPEAK_POPULATION.redshift))
    assert dz == pytest.approx(want, abs=1e-5)

    q2 = jnp.asarray(0.5)
    dq = float(log_dndmdqdv(pop, m1, q, z) - log_dndmdqdv(pop, m1, q2, z))
    p = DEFAULT_PLPEAK_MASS
    want_q = float(
        p.beta_q * (jnp.log(q) - jnp.log(q2))
        + log_planck_taper(q * m1, p.mmin, p.delta_m)
        - log_planck_taper(q2 * m1, p.mmin, p.delta_m)
    )
    assert dq == pytest.approx(want_q, abs=1e-5)


def test_intensity_support_cuts():
    """Outside the model support the log intensity is a steep finite soft
    wall (gradient-informative for NUTS), many tens of nats below any
    in-support value — never −inf/NaN."""
    pop = build_plpeak_population(DEFAULT_PLPEAK_POPULATION)
    p = DEFAULT_PLPEAK_MASS
    ref = float(pop.log_dndmdqdv(jnp.asarray(30.0), jnp.asarray(0.9), jnp.asarray(0.1)))
    for m1, q in (
        (float(p.mmin) - 0.5, 0.9),  # primary below the taper foot
        (M_TAB_HI + 1.0, 0.9),  # beyond the q-table edge
        (40.0, 0.05),  # secondary below the taper: q·m1 < mmin
    ):
        v = float(pop.log_dndmdqdv(jnp.asarray(m1), jnp.asarray(q), jnp.asarray(0.1)))
        assert np.isfinite(v) and v < ref - 5.0, (m1, q, v, ref)


def _tiny_pop_data(seed=0, nobs=6, nsamp=32, nsel=256):
    from bumpcosmology_tpu.inference.likelihoods import make_pop_data

    rng = np.random.default_rng(seed)
    m1 = rng.uniform(8, 60, (nobs, nsamp))
    q = rng.uniform(0.3, 1.0, (nobs, nsamp))
    z = rng.uniform(0.05, 1.0, (nobs, nsamp))
    pd = np.full((nobs, nsamp), 0.01)
    m1s = rng.uniform(8, 60, nsel)
    qs = rng.uniform(0.3, 1.0, nsel)
    zs = rng.uniform(0.05, 1.0, nsel)
    pds = np.full(nsel, 0.01)
    return make_pop_data(m1, q, z, pd, m1s, qs, zs, pds, ndraw=4.0 * nsel)


def test_plpeak_spec_value_and_grad_finite():
    from bumpcosmology_tpu.inference.likelihoods import plpeak_model_spec
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample

    spec = plpeak_model_spec(_tiny_pop_data(), n_grid=128)
    assert spec.dim == 12
    pot = jax.jit(make_potential(spec))
    for seed in range(8):
        th = prior_sample(spec, jax.random.PRNGKey(seed))
        u, g = jax.value_and_grad(pot)(th)
        assert np.isfinite(float(u))
        assert np.all(np.isfinite(np.asarray(g)))


def test_plpeak_potential_finite_for_out_of_support_events():
    """Soft-wall regression test (round 4).  Events deliberately placed where
    many hyperparameter draws exclude them — at the low edge (m1 ≈ 5–8, so
    mmin draws above them cut them off) and far above every mmax (m1 ≈ 150)
    — must still give a FINITE potential and gradient at EVERY prior draw.
    The round-3 hard-wall density put 27/32 prior draws at −inf here, which
    is the root cause of the all-14-site plpeak SBC failure
    (scratch/run_sbc_plpeak.log, VERDICT r3 weak #3)."""
    from bumpcosmology_tpu.inference.likelihoods import make_pop_data, plpeak_model_spec
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample

    rng = np.random.default_rng(42)
    nobs, nsamp, nsel = 6, 16, 128
    m1 = np.concatenate(
        [rng.uniform(5.0, 8.0, (nobs - 2, nsamp)), rng.uniform(140.0, 160.0, (2, nsamp))]
    )
    q = rng.uniform(0.3, 1.0, (nobs, nsamp))
    z = rng.uniform(0.05, 1.0, (nobs, nsamp))
    data = make_pop_data(
        m1, q, z, np.full((nobs, nsamp), 0.01),
        rng.uniform(5.0, 60.0, nsel), rng.uniform(0.3, 1.0, nsel),
        rng.uniform(0.05, 1.0, nsel), np.full(nsel, 0.01), ndraw=4.0 * nsel,
    )
    spec = plpeak_model_spec(data, n_grid=128)
    pot = jax.jit(make_potential(spec))
    vg = jax.jit(jax.vmap(jax.value_and_grad(pot)))
    keys = jax.random.split(jax.random.PRNGKey(7), 32)
    thetas = jax.vmap(lambda k: prior_sample(spec, k))(keys)
    u, g = vg(thetas)
    assert np.all(np.isfinite(np.asarray(u))), np.asarray(u)
    assert np.all(np.isfinite(np.asarray(g)))


def test_brokenpl_potential_finite_for_out_of_support_events():
    """Same soft-wall regression guarantee for the third family."""
    from bumpcosmology_tpu.inference.likelihoods import brokenpl_model_spec, make_pop_data
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample

    rng = np.random.default_rng(43)
    nobs, nsamp, nsel = 6, 16, 128
    m1 = np.concatenate(
        [rng.uniform(5.0, 8.0, (nobs - 2, nsamp)), rng.uniform(140.0, 160.0, (2, nsamp))]
    )
    q = rng.uniform(0.3, 1.0, (nobs, nsamp))
    z = rng.uniform(0.05, 1.0, (nobs, nsamp))
    data = make_pop_data(
        m1, q, z, np.full((nobs, nsamp), 0.01),
        rng.uniform(5.0, 60.0, nsel), rng.uniform(0.3, 1.0, nsel),
        rng.uniform(0.05, 1.0, nsel), np.full(nsel, 0.01), ndraw=4.0 * nsel,
    )
    spec = brokenpl_model_spec(data, n_grid=128)
    pot = jax.jit(make_potential(spec))
    vg = jax.jit(jax.vmap(jax.value_and_grad(pot)))
    keys = jax.random.split(jax.random.PRNGKey(8), 32)
    thetas = jax.vmap(lambda k: prior_sample(spec, k))(keys)
    u, g = vg(thetas)
    assert np.all(np.isfinite(np.asarray(u))), np.asarray(u)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_plpeak_cosmo_spec_fused_matches_unfused():
    """The detector-table fused path must agree with the direct cosmology
    path for the PLPeak family too (the pallas fast path is bump-only and
    must not be taken)."""
    from bumpcosmology_tpu.inference.likelihoods import (
        make_pop_cosmo_data,
        plpeak_cosmo_loglike,
        plpeak_cosmo_model_spec,
        set_logwts_impl,
    )
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample, constrain

    rng = np.random.default_rng(3)
    nobs, nsamp, nsel = 5, 24, 200
    z = rng.uniform(0.05, 1.0, (nobs, nsamp))
    zs = rng.uniform(0.05, 1.0, nsel)
    m1 = rng.uniform(8, 60, (nobs, nsamp))
    data = make_pop_cosmo_data(
        m1 * (1 + z), rng.uniform(0.3, 1.0, (nobs, nsamp)), 3.0 * z + 0.4,
        np.full((nobs, nsamp), 0.01),
        rng.uniform(8, 60, nsel) * (1 + zs), rng.uniform(0.3, 1.0, nsel),
        3.0 * zs + 0.4, np.full(nsel, 0.01), ndraw=4.0 * nsel,
    )
    spec = plpeak_cosmo_model_spec(data, n_grid=128, n_z=256)
    th = prior_sample(spec, jax.random.PRNGKey(0))
    sites = constrain(spec, th)
    fused = float(spec.loglike(sites))
    direct = float(plpeak_cosmo_loglike(sites, data, n_grid=128, n_z=256, dl_bounds=None))
    assert fused == pytest.approx(direct, rel=2e-4)
    # pallas override must silently fall back to XLA for this family
    set_logwts_impl("pallas")
    try:
        forced = float(spec.loglike(sites))
    finally:
        set_logwts_impl(None)
    assert forced == fused


def test_plpeak_deterministics_keys_and_R():
    from bumpcosmology_tpu.inference.likelihoods import (
        plpeak_deterministics,
        plpeak_model_spec,
    )
    from bumpcosmology_tpu.inference.model import constrain, prior_sample

    data = _tiny_pop_data()
    spec = plpeak_model_spec(data, n_grid=128)
    sites = constrain(spec, prior_sample(spec, jax.random.PRNGKey(4)))
    det = plpeak_deterministics(sites, data, n_grid=128)
    for key in ("R", "kappa", "neff", "neff_sel", "selection_noise_nats",
                "mdNdmdVdt_fixed_qz", "dNdqdVdt_fixed_mz", "dNdVdt_fixed_mq"):
        assert key in det, key
    assert "mbhmax" not in det  # bump-family reparam, not a PLPeak quantity
    assert det["neff"].shape == (6,)
    assert np.all(np.isfinite(np.asarray(det["mdNdmdVdt_fixed_qz"])))


@pytest.mark.slow
def test_plpeak_fit_smoke_and_compare_integration():
    """Short NUTS fit of the PLPeak family on a tiny catalog; the pointwise
    log-likelihood matrix then feeds PSIS-LOO, exercising the cross-family
    ``pipeline compare`` path."""
    from bumpcosmology_tpu.inference.likelihoods import plpeak_loglike, plpeak_model_spec
    from bumpcosmology_tpu.inference.model_compare import pointwise_matrix, psis_loo
    from bumpcosmology_tpu.inference.sampler import fit

    data = _tiny_pop_data()
    spec = plpeak_model_spec(data, n_grid=128)
    res = fit(
        spec, jax.random.PRNGKey(7), num_warmup=150, num_samples=100, num_chains=2
    )
    assert np.all(np.isfinite(np.asarray(res.posterior["alpha"])))

    import math as _math
    from jax.scipy.special import logsumexp as _lse

    def pointwise(sites):
        from bumpcosmology_tpu.inference.likelihoods import _pop_event_sel_logwts, _build_plpeak

        _, lw, lsw = _pop_event_sel_logwts(sites, data, 128, _build_plpeak)
        return (_lse(lw, axis=1) - _math.log(lw.shape[1])) - (
            _lse(lsw) - data.selection.log_ndraw
        )

    ll = pointwise_matrix(pointwise, res.posterior, spec.names, max_draws=64, batch=16)
    assert ll.shape == (64, 6)
    loo = psis_loo(ll)
    assert np.isfinite(loo.elpd)

    # bridge-sampling evidence on the same trace: a real 12-site hierarchical
    # spec end-to-end (the analytic calibration lives in tests/test_evidence.py)
    from bumpcosmology_tpu.inference.evidence import log_evidence_bridge

    ev = log_evidence_bridge(spec, res.posterior, max_draws=200)
    assert ev.converged and np.isfinite(ev.log_z)


def test_dndm_fitted_overlays_plpeak_band(tmp_path):
    """dNdm_fitted overlays the PLPeak band when trace_plpeak.h5 sits next
    to the bump trace (shared pivot convention makes them comparable)."""
    import matplotlib

    matplotlib.use("Agg")
    from bumpcosmology_tpu.figures.plots import dndm_fitted
    from bumpcosmology_tpu.utils.trace import Trace, save_trace

    rng = np.random.default_rng(0)
    curve = np.exp(rng.normal(0.0, 0.1, (2, 50, 128)))
    save_trace(
        tmp_path / "trace.h5",
        Trace({"mdNdmdVdt_fixed_qz": curve}, {}, coords={},
              attrs={"model": "pop", "family": "bump"}),
    )
    p_single = dndm_fitted(tmp_path / "trace.h5", out=tmp_path / "single.pdf")
    assert p_single.exists()
    size_single = p_single.stat().st_size
    save_trace(
        tmp_path / "trace_plpeak.h5",
        Trace({"mdNdmdVdt_fixed_qz": 2.0 * curve}, {}, coords={},
              attrs={"model": "pop", "family": "plpeak"}),
    )
    p_both = dndm_fitted(tmp_path / "trace.h5", out=tmp_path / "both.pdf")
    assert p_both.exists() and p_both.stat().st_size > size_single  # extra band drawn


@pytest.mark.slow
def test_plpeak_fresh_simulator_and_sbc_spec():
    """The family-generalized fresh-noise simulator draws a valid PLPeak
    catalog and the SBC spec builder (mmin restricted to the campaign's
    m1 >= 5 support) yields a finite differentiable potential at its own
    prior draws — the nightly guard on the plpeak_cosmo SBC path (slow
    tier: the 24k-draw campaign + potential-grad compile dominate)."""
    from bumpcosmology_tpu.inference.calibration import (
        make_mock_pop_cosmo_simulator_fresh,
        make_plpeak_cosmo_sbc_spec_builder,
    )
    from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample
    from bumpcosmology_tpu.mock import draw_injection_campaign

    inj = draw_injection_campaign(ndraw=24_000, seed=71, snr_chunk=8192)
    builder = make_plpeak_cosmo_sbc_spec_builder(n_grid=64, n_z=128)
    proto = builder(None)
    assert float(proto.priors["mmin"].low) == 5.0  # support slice documented
    rng = np.random.default_rng(72)
    sites = {
        k: np.asarray(v)
        for k, v in constrain(proto, prior_sample(proto, jax.random.PRNGKey(73))).items()
    }
    simulate = make_mock_pop_cosmo_simulator_fresh(
        inj, nobs=3, nsamp=8, nsel=24, pe_bank_size=512,
        threshold=10.0, family="plpeak", max_bank_doublings=1,
    )
    data = simulate(rng, sites)
    assert data.events.a.shape == (3, 8)
    assert data.selection.a.shape == (24,)
    assert np.all(np.isfinite(np.asarray(data.events.log_pdraw)))
    spec = builder(data)
    u, g = jax.value_and_grad(make_potential(spec))(prior_sample(spec, jax.random.PRNGKey(74)))
    assert np.isfinite(np.asarray(u))
    assert np.all(np.isfinite(np.asarray(g)))
