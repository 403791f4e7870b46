"""BROKEN POWER LAW mass-model family (models/brokenpl.py).

Same oracle strategy as the other two families (``tests/test_mass.py``,
``tests/test_plpeak.py``): analytic pieces against independent float64
scipy/numpy computations, the shared q-pairing normalization against
adaptive quadrature, the pivot convention, then spec-level value+gradient
health.  (No reference code exists for this family — it is the LVK
appendix-B phenomenological alternative, a beyond-parity addition.)
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import quad

from bumpcosmology_tpu.models.brokenpl import (
    DEFAULT_BROKENPL_MASS,
    DEFAULT_BROKENPL_POPULATION,
    BrokenPLMassParams,
    BrokenPLPopulationParams,
    build_brokenpl_population,
    log_pm1_brokenpl,
)
from bumpcosmology_tpu.models.mass import MREF
from bumpcosmology_tpu.models.parameters import RedshiftParams


def _taper_np(m, mmin, dm):
    m = np.asarray(m, dtype=np.float64)
    out = np.zeros_like(m)
    out[m >= mmin + dm] = 1.0
    mid = (m > mmin) & (m < mmin + dm)
    x = m[mid] - mmin
    with np.errstate(over="ignore"):
        out[mid] = 1.0 / (np.exp(dm / x + dm / (x - dm)) + 1.0)
    return out


def _pm1_unnorm_np(m, p):
    """Un-tapered-unnormalized broken power law in float64 (+ taper)."""
    m = np.asarray(m, dtype=np.float64)
    mbreak = p.mmin + p.bfrac * (p.mmax - p.mmin)
    lo = m**-p.alpha1
    hi = m**-p.alpha2 * mbreak ** (p.alpha2 - p.alpha1)
    out = np.where(m < mbreak, lo, hi)
    out = out * _taper_np(m, p.mmin, p.delta_m)
    out[(m <= p.mmin) | (m >= p.mmax)] = 0.0
    return out


def test_pm1_brokenpl_matches_f64_quadrature():
    """log p(m1) = log[BPL·S] − log ∫ BPL (un-tapered norm, the GWTC
    convention) against scipy quadrature of the defining formula."""
    p = DEFAULT_BROKENPL_MASS
    mbreak = p.mmin + p.bfrac * (p.mmax - p.mmin)
    norm = (
        quad(lambda x: x**-p.alpha1, p.mmin, mbreak)[0]
        + mbreak ** (p.alpha2 - p.alpha1) * quad(lambda x: x**-p.alpha2, mbreak, p.mmax)[0]
    )
    m = np.linspace(p.mmin + p.delta_m + 0.5, p.mmax - 1.0, 200)
    got = np.asarray(log_pm1_brokenpl(p, jnp.asarray(m)), dtype=np.float64)
    mbr = p.mmin + p.bfrac * (p.mmax - p.mmin)
    want = np.where(
        m < mbr,
        -p.alpha1 * np.log(m),
        -p.alpha2 * np.log(m) + (p.alpha2 - p.alpha1) * np.log(mbr),
    ) - np.log(norm)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
    # outside support: finite soft walls (models/plpeak.py FOOT_SLOPE /
    # WALL_SLOPE), suppressed below in-support values, never −inf/NaN
    in_support = float(log_pm1_brokenpl(p, jnp.asarray(30.0)))
    lo = float(log_pm1_brokenpl(p, jnp.asarray(p.mmin - 0.1)))
    hi = float(log_pm1_brokenpl(p, jnp.asarray(p.mmax + 2.0)))
    assert np.isfinite(lo) and lo < in_support - 5.0
    assert np.isfinite(hi) and hi < in_support - 30.0


def test_pm1_continuous_at_break():
    p = DEFAULT_BROKENPL_MASS
    mbreak = p.mmin + p.bfrac * (p.mmax - p.mmin)
    below = float(log_pm1_brokenpl(p, jnp.asarray(mbreak - 1e-3)))
    above = float(log_pm1_brokenpl(p, jnp.asarray(mbreak + 1e-3)))
    assert abs(below - above) < 1e-3


def test_pm1_single_slope_limit():
    """alpha1 == alpha2: reduces to the plain truncated power law regardless
    of the break location."""
    for b in (0.2, 0.8):
        p = BrokenPLMassParams(
            alpha1=2.3, alpha2=2.3, bfrac=b, beta_q=1.0, mmin=5.0, mmax=60.0, delta_m=1.0
        )
        m = np.linspace(6.5, 59.0, 80)
        got = np.asarray(log_pm1_brokenpl(p, jnp.asarray(m)), dtype=np.float64)
        norm = quad(lambda x: x**-2.3, 5.0, 60.0)[0]
        want = -2.3 * np.log(m) - np.log(norm)
        np.testing.assert_allclose(got, want, rtol=3e-5)


def test_qnorm_table_matches_quadrature():
    """The shared q-pairing normalization, queried through the intensity at
    BrokenPL hyperparameters, matches f64 adaptive quadrature."""
    intensity = build_brokenpl_population(DEFAULT_BROKENPL_POPULATION)
    p = DEFAULT_BROKENPL_MASS
    from bumpcosmology_tpu.ops.interp import interp_unit_spaced

    def oracle(m1):
        return quad(
            lambda q: q**p.beta_q * _taper_np(np.array([q * m1]), p.mmin, p.delta_m)[0],
            1e-3, 1.0, limit=200,
        )[0]

    # at exact table nodes only quadrature error enters (log-spaced 128-node
    # trapezoid): tight
    dm = float(intensity.dm)
    m_lo = float(intensity.m_lo)
    for k in (8, 24, 70):
        m1 = m_lo + k * dm
        got = float(np.exp(np.asarray(intensity.log_nq)[k]))
        np.testing.assert_allclose(got, oracle(m1), rtol=5e-3)

    # off-node queries add the linear-in-log interpolation error across the
    # ~0.78 Msun table spacing — worst where the taper edge curves N_q
    # (small m1); ≲2% there, ≪1% above the taper
    for m1, rtol in ((8.0, 2e-2), (20.0, 3e-3), (55.0, 3e-3)):
        got = float(
            jnp.exp(
                interp_unit_spaced(
                    jnp.asarray(m1), intensity.m_lo, intensity.dm, intensity.log_nq
                )
            )
        )
        np.testing.assert_allclose(got, oracle(m1), rtol=rtol)


def test_pivot_normalization_and_gradients():
    """m·dN/dm1 dq dV dt = 1 at (MREF, QREF=1, ZREF=0) — the shared pivot
    convention that makes R comparable across the three families — and the
    whole intensity is differentiable in every hyperparameter."""
    intensity = build_brokenpl_population(DEFAULT_BROKENPL_POPULATION)
    val = float(
        jnp.exp(intensity.log_dndmdqdv(jnp.asarray(MREF), jnp.asarray(1.0), jnp.asarray(0.0)))
    )
    np.testing.assert_allclose(val * MREF, 1.0, rtol=1e-5)

    def f(raw):
        mass = BrokenPLMassParams(*raw[:7])
        params = BrokenPLPopulationParams(
            mass=mass, redshift=RedshiftParams(lam=raw[7], kappa=raw[8], zp=raw[9])
        )
        inten = build_brokenpl_population(params)
        return jnp.sum(
            inten.log_dndmdqdv(
                jnp.asarray([10.0, 35.0, 60.0]),
                jnp.asarray([0.9, 0.7, 0.8]),
                jnp.asarray([0.1, 0.4, 0.9]),
            )
        )

    raw = jnp.asarray([1.6, 5.6, 0.43, 1.4, 4.0, 87.0, 4.8, 4.7, 7.0, 3.0])
    v, g = jax.value_and_grad(f)(raw)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_brokenpl_spec_value_and_grad_finite():
    """Spec-level health: finite potential + gradient at a prior draw on a
    tiny synthetic catalog (the family's fast-tier likelihood guard)."""
    from bumpcosmology_tpu.inference.likelihoods import brokenpl_model_spec
    from bumpcosmology_tpu.inference.model import make_potential, prior_sample
    from bumpcosmology_tpu.testing import synthetic_pop_data

    data = synthetic_pop_data(nobs=4, nsamp=8, nsel=32, seed=9)
    spec = brokenpl_model_spec(data, n_grid=64)
    theta = prior_sample(spec, jax.random.PRNGKey(3))
    u, g = jax.value_and_grad(make_potential(spec))(theta)
    assert np.isfinite(np.asarray(u))
    assert np.all(np.isfinite(np.asarray(g)))


def test_registry_has_all_three_families():
    from bumpcosmology_tpu.inference.likelihoods import MASS_FAMILIES

    assert set(MASS_FAMILIES) == {"bump", "plpeak", "brokenpl"}
    assert MASS_FAMILIES["bump"].trace_name == "trace.h5"  # reference naming kept
    assert MASS_FAMILIES["bump"].cosmo_trace_name == "trace_cosmo.h5"
    for name, fam in MASS_FAMILIES.items():
        if name != "bump":
            assert name in fam.trace_name and name in fam.cosmo_trace_name
            assert fam.build is not None
    # prior dicts carry the shared redshift/rate blocks
    for fam in MASS_FAMILIES.values():
        for site in ("lam", "dkappa", "zp", "R_unit"):
            assert site in fam.pop_priors and site in fam.cosmo_priors
        for site in ("h", "Om", "w"):
            assert site not in fam.pop_priors and site in fam.cosmo_priors
