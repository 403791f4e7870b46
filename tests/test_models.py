"""L1 model tests against scipy/analytic oracles."""
import math

import jax.numpy as jnp
import numpy as np
import scipy.integrate as sint

from bumpcosmology_tpu.models import (
    DEFAULT_MASS,
    DEFAULT_POPULATION,
    DEFAULT_REDSHIFT,
    PLANCK18,
    build_cosmology,
    build_mass_function,
    build_population,
    dc_at_z,
    dl_at_z,
    ddl_dz_at_z,
    dvc_dz_at_z,
    efunc,
    largest_mco,
    log_diff_comoving_volume_rate,
    log_dndm,
    log_dndm_co,
    log_dndmdqdv,
    log_dndv,
    log_smooth_turnon,
    mean_mbh_from_mco,
    planck18_table,
    vc_at_z,
    z_at_dl,
)
from bumpcosmology_tpu.models.mass import MREF, MBH_MIN
from bumpcosmology_tpu.models.parameters import CosmoParams


# ---------------------------------------------------------------- mass model


def test_mean_mbh_identity_below_mpisn():
    m = np.linspace(1.0, 30.9, 10)
    got = np.asarray(mean_mbh_from_mco(jnp.asarray(m), 31.0, 36.0))
    np.testing.assert_allclose(got, m, rtol=1e-6)


def test_mean_mbh_peaks_at_mbhmax():
    mpisn, mbhmax = 31.0, 36.0
    mco_peak = 2 * mbhmax - mpisn
    got = float(mean_mbh_from_mco(jnp.asarray(mco_peak), mpisn, mbhmax))
    np.testing.assert_allclose(got, mbhmax, rtol=1e-6)
    # continuity at the junction
    lo = float(mean_mbh_from_mco(jnp.asarray(mpisn - 1e-4), mpisn, mbhmax))
    hi = float(mean_mbh_from_mco(jnp.asarray(mpisn + 1e-4), mpisn, mbhmax))
    assert abs(lo - hi) < 1e-3


def test_largest_mco_gives_zero_mass():
    mpisn, mbhmax = 31.0, 36.0
    mco_max = float(largest_mco(mpisn, mbhmax))
    got = float(mean_mbh_from_mco(jnp.asarray(mco_max), mpisn, mbhmax))
    np.testing.assert_allclose(got, 0.0, atol=1e-3)


def test_log_dndm_co_broken_power_law():
    a, b = 1.8, -0.71
    np.testing.assert_allclose(float(log_dndm_co(jnp.asarray(20.0), a, b)), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(log_dndm_co(jnp.asarray(10.0), a, b)), -a * math.log(0.5), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(log_dndm_co(jnp.asarray(40.0), a, b)), -b * math.log(2.0), rtol=1e-5
    )


def test_log_smooth_turnon_endpoints():
    # 2*sigmoid form: 0 at m << mmin, 1 at m = mmin, -> 2 far above
    # (matches the reference form exactly, ``intensity_models.py:45-54``)
    assert float(log_smooth_turnon(jnp.asarray(30.0), 30.0)) == 0.0
    np.testing.assert_allclose(
        float(log_smooth_turnon(jnp.asarray(300.0), 30.0)), math.log(2.0), atol=1e-5
    )
    assert float(log_smooth_turnon(jnp.asarray(10.0), 30.0)) < -10.0


def _bump_oracle(m, p):
    """Direct f64 quadrature of the PISN-bump integral."""
    mco_hi = float(largest_mco(p.mpisn, p.mbhmax))

    def integrand(mco):
        mu = np.where(
            mco < p.mpisn,
            mco,
            p.mbhmax + (mco - (2 * p.mbhmax - p.mpisn)) ** 2 / (4 * (p.mpisn - p.mbhmax)),
        )
        x = np.log(mco / 20.0)
        dn = np.exp(np.where(mco < 20.0, -p.a * x, -p.b * x))
        return dn * np.exp(-0.5 * ((m - mu) / p.sigma) ** 2) / (np.sqrt(2 * np.pi) * p.sigma)

    val, _ = sint.quad(integrand, 1.0, mco_hi, limit=500)
    return val


def test_pisn_bump_grid_matches_quadrature():
    from bumpcosmology_tpu.models.mass import pisn_bump_log_dndm_grid

    p = DEFAULT_MASS
    mbh_lo, dmbh, log_dn = pisn_bump_log_dndm_grid(p)
    log_dn = np.asarray(log_dn)
    for m in [10.0, 20.0, 30.0, 34.0, 36.0, 40.0]:
        i = round((m - mbh_lo) / float(dmbh))
        m_i = mbh_lo + i * float(dmbh)
        want = _bump_oracle(m_i, p)
        got = math.exp(log_dn[i])
        np.testing.assert_allclose(got, want, rtol=3e-2)


def test_mass_function_normalized_at_mref():
    table = build_mass_function(DEFAULT_MASS)
    got = float(log_dndm(table, jnp.asarray(MREF)))
    np.testing.assert_allclose(got, -math.log(MREF), atol=1e-5)


def test_mass_function_cutoffs_and_tail():
    table = build_mass_function(DEFAULT_MASS)
    assert float(log_dndm(table, jnp.asarray(4.0))) == -np.inf
    assert float(log_dndm(table, jnp.asarray(MBH_MIN - 1e-3))) == -np.inf
    # far above the bump grid only the power-law tail contributes:
    m = 120.0
    got = float(log_dndm(table, jnp.asarray(m)))
    p = DEFAULT_MASS
    want = (
        -p.c * math.log(m / p.mbhmax)
        + float(table.log_pl_norm)
        + math.log(2.0)  # saturated turn-on
        + float(table.log_norm)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mass_function_finite_on_support():
    table = build_mass_function(DEFAULT_MASS)
    m = np.linspace(5.5, 140.0, 200)
    vals = np.asarray(log_dndm(table, jnp.asarray(m)))
    assert np.all(np.isfinite(vals))


# ------------------------------------------------------------- redshift model


def test_log_dndv_normalized_at_zero():
    assert float(log_dndv(0.0, DEFAULT_REDSHIFT)) == 0.0


def test_log_dndv_formula():
    p = DEFAULT_REDSHIFT
    z = 1.7
    want = (
        p.lam * math.log1p(z)
        - math.log1p(((1 + z) / (1 + p.zp)) ** p.kappa)
        + math.log1p((1 / (1 + p.zp)) ** p.kappa)
    )
    np.testing.assert_allclose(float(log_dndv(z, p)), want, rtol=1e-5)


# ---------------------------------------------------------------- population


def test_log_dndmdqdv_composition():
    pop = build_population(DEFAULT_POPULATION)
    m1, q, z = 40.0, 0.8, 0.5
    got = float(log_dndmdqdv(pop, m1, q, z))
    want = (
        float(log_dndm(pop.mass_table, jnp.asarray(m1)))
        + float(log_dndm(pop.mass_table, jnp.asarray(q * m1)))
        + DEFAULT_MASS.beta * math.log((m1 + q * m1) / (30.0 * 2.0))
        + math.log(m1)
        + float(log_dndv(z, DEFAULT_REDSHIFT))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ----------------------------------------------------------------- cosmology


def test_efunc_analytic():
    p = CosmoParams(h=0.7, Om=0.3, w=-1.0)
    z = 1.0
    want = math.sqrt(0.3 * 8 + 0.7)
    np.testing.assert_allclose(float(efunc(z, p)), want, rtol=1e-6)
    # w != -1 branch
    p2 = CosmoParams(h=0.7, Om=0.3, w=-0.8)
    want2 = math.sqrt(0.3 * 8 + 0.7 * 2 ** (3 * 0.2))
    np.testing.assert_allclose(float(efunc(z, p2)), want2, rtol=1e-6)


def test_comoving_distance_vs_quad():
    p = PLANCK18
    table = build_cosmology(p, n=4096)
    dh = 2.99792458 / p.h

    def inv_e(z):
        return 1.0 / math.sqrt(p.Om * (1 + z) ** 3 + (1 - p.Om))

    for z in [0.1, 0.5, 1.0, 3.0]:
        want = dh * sint.quad(inv_e, 0, z)[0]
        got = float(dc_at_z(table, jnp.asarray(z)))
        np.testing.assert_allclose(got, want, rtol=2e-3)


def test_luminosity_distance_relations():
    table = build_cosmology(PLANCK18)
    z = jnp.asarray([0.2, 0.9, 2.5])
    dl = dl_at_z(table, z)
    dc = dc_at_z(table, z)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(dc) * (1 + np.asarray(z)), rtol=1e-4)


def test_z_of_dl_roundtrip():
    table = build_cosmology(PLANCK18)
    z = jnp.asarray(np.linspace(0.05, 5.0, 40))
    dl = dl_at_z(table, z)
    back = np.asarray(z_at_dl(table, dl))
    np.testing.assert_allclose(back, np.asarray(z), rtol=2e-3, atol=2e-3)


def test_dvc_consistent_with_vc_derivative():
    table = build_cosmology(PLANCK18, n=4096)
    z0, dz = 1.0, 1e-3
    dnum = (float(vc_at_z(table, z0 + dz)) - float(vc_at_z(table, z0 - dz))) / (2 * dz)
    dgot = float(dvc_dz_at_z(table, jnp.asarray(z0)))
    np.testing.assert_allclose(dgot, dnum, rtol=5e-3)


def test_ddl_dz_consistent_with_dl_derivative():
    table = build_cosmology(PLANCK18, n=4096)
    z0, dz = 0.8, 1e-3
    dnum = (float(dl_at_z(table, z0 + dz)) - float(dl_at_z(table, z0 - dz))) / (2 * dz)
    dgot = float(ddl_dz_at_z(table, jnp.asarray(z0)))
    np.testing.assert_allclose(dgot, dnum, rtol=5e-3)


def test_planck18_table_matches_build():
    fixed = planck18_table()
    built = build_cosmology(PLANCK18, n=4096)
    for z in [0.3, 1.2, 4.0]:
        np.testing.assert_allclose(
            float(dc_at_z(fixed, jnp.asarray(z))),
            float(dc_at_z(built, jnp.asarray(z))),
            rtol=1e-3,
        )


def test_log_diff_comoving_volume_rate():
    table = build_cosmology(PLANCK18, n=4096)
    z = 1.0
    want = math.log(float(dvc_dz_at_z(table, jnp.asarray(z)))) - math.log1p(z)
    got = float(log_diff_comoving_volume_rate(table, jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dvc_and_ddl_fused_lookup():
    from bumpcosmology_tpu.models import dvc_and_ddl_at_z

    table = build_cosmology(PLANCK18)
    z = jnp.asarray([0.1, 0.8, 2.0])
    dvc, ddl = dvc_and_ddl_at_z(table, z)
    np.testing.assert_allclose(np.asarray(dvc), np.asarray(dvc_dz_at_z(table, z)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ddl), np.asarray(ddl_dz_at_z(table, z)), rtol=1e-6)


def test_log_dndmdqdv_stacked_lookup_matches_separate():
    pop = build_population(DEFAULT_POPULATION)
    m1 = jnp.asarray([12.0, 33.0, 41.0])
    q = jnp.asarray([0.9, 0.7, 0.95])
    z = jnp.asarray([0.1, 0.4, 0.9])
    got = np.asarray(log_dndmdqdv(pop, m1, q, z))
    want = (
        np.asarray(log_dndm(pop.mass_table, m1))
        + np.asarray(log_dndm(pop.mass_table, q * m1))
        + DEFAULT_MASS.beta * np.log(np.asarray(m1 + q * m1) / 60.0)
        + np.log(np.asarray(m1))
        + np.asarray(log_dndv(z, DEFAULT_REDSHIFT))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
