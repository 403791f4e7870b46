"""L3 ingestion tests against synthetic GWTC-format HDF5 fixtures."""
import math

import h5py
import numpy as np
import pytest

from bumpcosmology_tpu.data import (
    RejectedEventError,
    default_pop_wt,
    dm1sqz_dm1ddqdl,
    extract_posterior_samples,
    extract_selection_samples,
    importance_neff,
    li_prior_wt,
    planck18_dc_np,
    planck18_dl_np,
    planck18_efunc_np,
    planck18_z_of_dl_np,
    resample_injections,
)


# ------------------------------------------------------------------- weights


def test_planck18_np_roundtrip():
    z = np.linspace(0.05, 5.0, 50)
    dl = planck18_dl_np(z)
    np.testing.assert_allclose(planck18_z_of_dl_np(dl), z, rtol=1e-3)
    np.testing.assert_allclose(dl, planck18_dc_np(z) * (1 + z), rtol=1e-5)


def test_planck18_known_scale():
    # Planck18 comoving distance at z=1 is ~3.40 Gpc (flat LCDM, h=0.6766)
    assert 3.3 < planck18_dc_np(1.0) < 3.5
    np.testing.assert_allclose(planck18_efunc_np(0.0), 1.0, rtol=1e-6)


def test_li_prior_wt_positive_and_consistent():
    z = np.array([0.1, 0.5, 1.5])
    m1 = np.array([10.0, 30.0, 50.0])
    q = np.array([0.9, 0.8, 0.7])
    w = li_prior_wt(m1, q, z)
    assert np.all(w > 0)
    # cosmology-weighted variant differs by the dL^2(...) vs dVc/dz measure
    wc = li_prior_wt(m1, q, z, cosmology_weighted=True)
    assert np.all(wc > 0) and not np.allclose(w, wc)


def test_frame_jacobian_matches_numerical():
    """dm1sqz_dm1ddqdl = dz/ddL · 1/(1+z) — check dz/ddL numerically."""
    z0, dz = 0.7, 1e-4
    ddl = planck18_dl_np(z0 + dz) - planck18_dl_np(z0 - dz)
    dz_ddl = 2 * dz / ddl
    got = dm1sqz_dm1ddqdl(30.0, 0.9, z0)
    np.testing.assert_allclose(got, dz_ddl / (1 + z0), rtol=1e-3)


def test_default_pop_wt_positive_on_support():
    w = default_pop_wt(np.array([20.0, 35.0]), np.array([0.8, 0.9]), np.array([0.2, 0.5]))
    assert np.all(w > 0) and np.all(np.isfinite(w))
    # outside support (m2 < 5) the weight is zero
    w0 = default_pop_wt(np.array([20.0]), np.array([0.1]), np.array([0.2]))
    assert w0[0] == 0.0


# ------------------------------------------------------ PE sample extraction


def _write_pe_fixture(path, group, n=4096, seed=0, low_mass=False):
    rng = np.random.default_rng(seed)
    m1 = rng.uniform(4.0, 12.0, n) if low_mass else rng.uniform(20.0, 50.0, n)
    q = rng.uniform(0.2, 0.6, n) if low_mass else rng.uniform(0.5, 1.0, n)
    z = rng.uniform(0.05, 0.8, n)
    arr = np.zeros(n, dtype=[("mass_1_source", "f8"), ("mass_ratio", "f8"), ("redshift", "f8")])
    arr["mass_1_source"], arr["mass_ratio"], arr["redshift"] = m1, q, z
    with h5py.File(path, "w") as f:
        f.create_dataset(group, data=arr)


def test_extract_posterior_samples_o3a_and_o3b(tmp_path):
    rng = np.random.default_rng(1)
    for group in ("PublicationSamples/posterior_samples", "C01:Mixed/posterior_samples"):
        p = tmp_path / f"{group.split('/')[0].replace(':', '_')}.h5"
        _write_pe_fixture(p, group, seed=2)
        m1, q, z, wt = extract_posterior_samples(p, 128, desired_pop_wt=default_pop_wt, rng=rng)
        assert m1.shape == q.shape == z.shape == wt.shape == (128,)
        assert np.all((q > 0) & (q <= 1)) and np.all(wt > 0)


def test_extract_posterior_samples_rejects_low_m2(tmp_path):
    p = tmp_path / "low.h5"
    _write_pe_fixture(p, "PublicationSamples/posterior_samples", low_mass=True)
    with pytest.raises(RejectedEventError, match="median m2"):
        extract_posterior_samples(p, 128)


def test_extract_posterior_samples_rejects_low_neff(tmp_path):
    p = tmp_path / "ok.h5"
    _write_pe_fixture(p, "PublicationSamples/posterior_samples", n=300)
    # nsamp too large for the available Neff
    with pytest.raises(RejectedEventError, match="Neff"):
        extract_posterior_samples(p, 256, desired_pop_wt=default_pop_wt)


def test_extract_posterior_samples_unknown_layout(tmp_path):
    p = tmp_path / "weird.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("something_else", data=np.zeros(3))
    with pytest.raises(ValueError, match="could not read"):
        extract_posterior_samples(p, 16)


# ----------------------------------------------------- selection extraction


def _write_injection_fixture(path, n=20000, seed=3, frac_detected=0.3):
    rng = np.random.default_rng(seed)
    m1 = np.exp(rng.uniform(np.log(5.0), np.log(100.0), n))
    m2 = m1 * rng.uniform(0.3, 1.0, n)
    z = rng.uniform(0.05, 1.5, n)
    pdf_m = 1.0 / (m1 * m2)  # arbitrary positive sampling pdf
    pdf_z = np.full(n, 1.0 / 1.45)
    far = np.where(rng.uniform(size=n) < frac_detected, 0.1, 100.0)
    with h5py.File(path, "w") as f:
        g = f.create_group("injections")
        g.create_dataset("mass1_source", data=m1)
        g.create_dataset("mass2_source", data=m2)
        g.create_dataset("redshift", data=z)
        g.create_dataset("mass1_source_mass2_source_sampling_pdf", data=pdf_m)
        g.create_dataset("redshift_sampling_pdf", data=pdf_z)
        g.create_dataset("far_pycbc_hyperbank", data=far)
        g.create_dataset("far_pycbc_bbh", data=np.full(n, 100.0))
        g.create_dataset("far_gstlal", data=np.full(n, 100.0))
        g.create_dataset("far_mbta", data=np.full(n, 100.0))
        f.attrs["n_accepted"] = n
        f.attrs["n_rejected"] = 3 * n
        f.attrs["start_time_s"] = 0.0
        f.attrs["end_time_s"] = 3600.0 * 24.0 * 365.25  # exactly one year

    return far < 100.0


def test_extract_selection_samples(tmp_path):
    p = tmp_path / "inj.h5"
    detected = _write_injection_fixture(p)
    rng = np.random.default_rng(4)
    m1, q, z, pdraw, ndraw = extract_selection_samples(
        p, 512, desired_pop_wt=default_pop_wt, rng=rng
    )
    assert m1.shape == (512,)
    assert ndraw == 512.0
    assert np.all(pdraw > 0)
    assert np.all((q > 0) & (q <= 1.0 + 1e-12))


def test_selection_mu_estimate_invariant_under_reweighting(tmp_path):
    """The selection integral estimator Σ(wt/pdraw)/Ndraw must be (statistically)
    unchanged by reweighted subsampling — the pdraw renormalization contract
    of ``weighting.py:155-168``."""
    p = tmp_path / "inj2.h5"
    _write_injection_fixture(p, n=60000, seed=5)

    def wt_fn(m1, q, z):
        return default_pop_wt(m1, q, z)

    # direct estimate from the full detected set
    with h5py.File(p, "r") as f:
        m1 = np.asarray(f["injections/mass1_source"])
        m2 = np.asarray(f["injections/mass2_source"])
        z = np.asarray(f["injections/redshift"])
        pdraw = (
            np.asarray(f["injections/mass1_source_mass2_source_sampling_pdf"])
            * np.asarray(f["injections/redshift_sampling_pdf"])
            * m1
        )
        det = np.asarray(f["injections/far_pycbc_hyperbank"]) < 1.0
        ndraw_full = float(f.attrs["n_accepted"] + f.attrs["n_rejected"])
    q = m2 / m1
    mu_direct = np.sum(wt_fn(m1[det], q[det], z[det]) / pdraw[det]) / ndraw_full

    rng = np.random.default_rng(6)
    m1s, qs, zs, pdraws, ndraw = extract_selection_samples(
        p, 4096, desired_pop_wt=wt_fn, rng=rng
    )
    mu_sub = np.sum(wt_fn(m1s, qs, zs) / pdraws) / ndraw
    np.testing.assert_allclose(mu_sub, mu_direct, rtol=0.1)


def test_resample_injections_preserves_mu():
    """After resampling *to the same population used as the weight target*,
    each wt/pdraw_new equals the original estimate μ̂ = Σ(wt/pdraw)/Ndraw
    exactly — the renormalization contract of ``weighting.py:217-231``."""
    rng = np.random.default_rng(7)
    n = 50000
    m1 = np.exp(rng.uniform(np.log(6.0), np.log(80.0), n))
    q = rng.uniform(0.5, 1.0, n)
    z = rng.uniform(0.05, 1.0, n)
    pdraw = np.ones(n)
    ndraw = 4.0 * n

    mu_direct = np.sum(default_pop_wt(m1, q, z) / pdraw) / ndraw
    m1r, qr, zr, pdr, neff = resample_injections(m1, q, z, pdraw, ndraw, default_pop_wt, rng=rng)
    assert len(m1r) == int(round(neff))
    ratios = default_pop_wt(m1r, qr, zr) / pdr
    np.testing.assert_allclose(ratios, mu_direct, rtol=1e-6)
    # constant weights -> importance Neff of the resampled set equals its size
    np.testing.assert_allclose(importance_neff(ratios), len(m1r), rtol=1e-6)


def test_extract_posterior_samples_alternate_analysis_key(tmp_path):
    """Real-release quirk (VERDICT r2 #4): files carrying only a per-waveform
    C01:* analysis (no PublicationSamples / C01:Mixed) must still ingest."""
    p = tmp_path / "alt.h5"
    _write_pe_fixture(p, "C01:IMRPhenomXPHM/posterior_samples", seed=4)
    rng = np.random.default_rng(5)
    m1, q, z, wt = extract_posterior_samples(p, 128, desired_pop_wt=default_pop_wt, rng=rng)
    assert m1.shape == (128,) and np.all(wt > 0)


def test_extract_posterior_samples_drops_nan_rows(tmp_path):
    """Non-finite posterior rows are dropped, not propagated into weights."""
    p = tmp_path / "nan.h5"
    _write_pe_fixture(p, "PublicationSamples/posterior_samples", n=4096, seed=6)
    with h5py.File(p, "r+") as f:
        arr = np.asarray(f["PublicationSamples/posterior_samples"])
        arr["mass_1_source"][:37] = np.nan
        arr["redshift"][40:45] = np.inf
        del f["PublicationSamples/posterior_samples"]
        f.create_dataset("PublicationSamples/posterior_samples", data=arr)
    rng = np.random.default_rng(7)
    m1, q, z, wt = extract_posterior_samples(p, 128, desired_pop_wt=default_pop_wt, rng=rng)
    assert np.all(np.isfinite(m1)) and np.all(np.isfinite(wt))


def test_extract_selection_samples_missing_far_column_and_nan(tmp_path):
    """Injection files missing one search's FAR column (and carrying NaN FARs
    for un-analyzed injections) must ingest with detection = OR of the rest."""
    p = tmp_path / "inj.h5"
    _write_injection_fixture(p, n=20000, seed=8)
    with h5py.File(p, "r+") as f:
        del f["injections/far_mbta"]
        far = np.asarray(f["injections/far_gstlal"])
        far[::7] = np.nan
        del f["injections/far_gstlal"]
        f["injections"].create_dataset("far_gstlal", data=far)
    rng = np.random.default_rng(9)
    m1, q, z, pdraw, ndraw = extract_selection_samples(
        p, 256, desired_pop_wt=default_pop_wt, rng=rng
    )
    assert m1.shape == (256,) and np.all(np.isfinite(pdraw)) and ndraw == 256.0


def test_extract_selection_samples_no_far_columns_raises(tmp_path):
    p = tmp_path / "nofar.h5"
    _write_injection_fixture(p, n=2000, seed=10)
    with h5py.File(p, "r+") as f:
        for k in list(f["injections"]):
            if k.startswith("far_"):
                del f["injections"][k]
    with pytest.raises(ValueError, match="no FAR columns"):
        extract_selection_samples(p, 64, rng=np.random.default_rng(11))
