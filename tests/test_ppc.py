"""Posterior predictive checks (inference/ppc.py + the `ppc` stage).

Statistical contract: on a catalog drawn *from* the model, the PPC p-values
are moderate (the check is calibrated); on a catalog whose redshift or mass
distribution is grossly misspecified relative to the fitted parameters, the
corresponding observable's p-value collapses (the check has power).  The
catalog construction is self-consistent by design: events are importance
draws from the population, PE "samples" are broad-proposal draws with their
proposal density as pdraw, and the injection set is the same proposal with
no selection cut — so the predicted detected population IS the population.
"""
import math

import jax
import numpy as np
import pytest

from bumpcosmology_tpu.inference.likelihoods import POP_PRIORS, make_pop_data
from bumpcosmology_tpu.inference.ppc import (
    _ks_against_weighted_cdf,
    posterior_predictive_check,
)

# Fiducial-like truth but with a moderate rate slope: the fiducial lam = 4.7
# concentrates the (selection-free) z distribution against the fixture's
# z = 2.5 proposal boundary, where PE smearing creates a boundary artifact
# unrelated to what the PPC measures.
TRUTH = {
    "a": 1.8, "b": -0.71, "c": 2.9, "mpisn": 31.0, "dmbhmax": 5.0,
    "sigma": 2.3, "beta": -2.2, "log_fpl": math.log(0.21),
    "lam": 1.5, "dkappa": 5.5, "zp": 2.0, "R_unit": 0.0,
}


def test_ks_statistic_behaviour():
    rng = np.random.default_rng(0)
    u = rng.random(500)
    d_unif = _ks_against_weighted_cdf(u)
    assert d_unif < 0.08  # ~1.6/sqrt(500) is the 99% point
    d_clust = _ks_against_weighted_cdf(0.5 + 0.05 * rng.random(500))
    assert d_clust > 0.4


def _self_consistent_catalog(sites, nobs=64, nsamp=128, nsel=2048, seed=1):
    """Catalog drawn from the population at ``sites`` (fixed Planck18)."""
    import jax.numpy as jnp

    from bumpcosmology_tpu.inference.likelihoods import (
        FixedCosmoGrid,
        population_from_sites,
    )
    from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv
    from bumpcosmology_tpu.models.cosmology import planck18_log_dvdz_grid

    rng = np.random.default_rng(seed)

    def proposal(n):
        m1 = np.exp(rng.uniform(np.log(5.0), np.log(150.0), n))
        q = rng.uniform(0.25, 1.0, n)
        z = rng.uniform(0.01, 2.5, n)
        # proposal density (loguniform m1 x uniform q x uniform z)
        pdraw = (1.0 / (m1 * math.log(150.0 / 5.0))) / 0.75 / 2.49
        return m1, q, z, pdraw

    pop = build_population(population_from_sites(
        {k: jnp.asarray(v) for k, v in sites.items()}), 128)
    zgrid, log_dv = planck18_log_dvdz_grid()
    du = np.log1p(zgrid[-1]) / (len(zgrid) - 1)
    finite_min = np.min(log_dv[np.isfinite(log_dv)])
    log_dv = np.where(np.isfinite(log_dv), log_dv, finite_min - 200.0)
    planck = FixedCosmoGrid(u0=jnp.asarray(0.0), du=jnp.asarray(du),
                            log_dv=jnp.asarray(log_dv, jnp.float32))

    def pop_logwt(m1, q, z, pdraw):
        lw = np.asarray(
            log_dndmdqdv(pop, jnp.asarray(m1), jnp.asarray(q), jnp.asarray(z))
            + planck.log_dvdz_dt(jnp.asarray(z))
        ) - np.log(pdraw)
        return lw

    # events: importance-resample the proposal pool down to nobs population draws
    pool = proposal(200_000)
    lw = pop_logwt(*pool)
    w = np.exp(lw - lw.max())
    w /= w.sum()
    idx = rng.choice(len(w), size=nobs, replace=False, p=w)
    m1_t, q_t, z_t = pool[0][idx], pool[1][idx], pool[2][idx]

    # PE samples: a NARROW measurement cloud around each event's truth (log
    # m1 / q / log z kernels), pdraw = the kernel density — informative
    # events, like real PE.  A broad zero-information cloud would let the
    # observed side be reweighted onto ANY fitted model and the PPC would
    # have no power by construction.
    s_lm, s_q, s_lz = 0.06, 0.03, 0.04
    lm = rng.normal(np.log(m1_t)[:, None], s_lm, (nobs, nsamp))
    qq = np.clip(rng.normal(q_t[:, None], s_q, (nobs, nsamp)), 0.02, 1.0)
    lz = rng.normal(np.log(z_t)[:, None], s_lz, (nobs, nsamp))
    m1s, zs = np.exp(lm), np.exp(lz)

    def norm_pdf(x, mu, s):
        return np.exp(-0.5 * ((x - mu) / s) ** 2) / (s * math.sqrt(2 * math.pi))

    pds = (
        norm_pdf(lm, np.log(m1_t)[:, None], s_lm) / m1s
        * norm_pdf(qq, q_t[:, None], s_q)
        * norm_pdf(lz, np.log(z_t)[:, None], s_lz) / zs
    )
    # injections: the broad proposal, no selection cut
    m1i, qi, zi, pdi = proposal(nsel)
    return make_pop_data(
        m1s, qq, zs, pds, m1i, qi, zi, pdi, ndraw=float(nsel),
    )


def _point_posterior(sites, n=96):
    return {k: np.full((1, n), v) for k, v in sites.items()}


@pytest.fixture(scope="module")
def calibrated_catalog():
    return _self_consistent_catalog(TRUTH)


def test_ppc_calibrated_on_self_consistent_catalog(calibrated_catalog):
    res = posterior_predictive_check(
        _point_posterior(TRUTH), list(POP_PRIORS), calibrated_catalog,
        n_grid=128, n_draws=96, seed=5, batch=16,
    )
    for col, p in res.p_values.items():
        assert 0.02 < p < 0.999, (col, p)
    assert res.n_draws == 96
    for col in ("a", "q", "c"):
        assert res.pred_cdf_q[col].shape[0] == 3
        assert np.all(np.diff(res.pred_cdf_q[col][1]) >= -1e-9)  # CDF monotone


def test_ppc_power_against_misspecified_redshift(calibrated_catalog):
    wrong = dict(TRUTH)
    wrong["lam"] = -2.0  # merger rate falling with z instead of steeply rising
    res = posterior_predictive_check(
        _point_posterior(wrong), list(POP_PRIORS), calibrated_catalog,
        n_grid=128, n_draws=96, seed=6, batch=16,
    )
    assert res.p_values["c"] < 0.01  # z distribution inconsistent
    assert res.ks_obs["c"].mean() > res.ks_rep["c"].mean()


def test_ppc_power_against_misspecified_mass(calibrated_catalog):
    wrong = dict(TRUTH)
    wrong["a"] = 4.5  # CO mass function far steeper than the truth's 1.8
    res = posterior_predictive_check(
        _point_posterior(wrong), list(POP_PRIORS), calibrated_catalog,
        n_grid=128, n_draws=96, seed=7, batch=16,
    )
    assert res.p_values["a"] < 0.01  # m1 distribution inconsistent


def test_ppc_stage_and_figure(tmp_path, calibrated_catalog):
    """The `ppc` stage on a tiny pe/sel table pair + a point-mass trace,
    then the figure renders from the artifact."""
    import matplotlib

    matplotlib.use("Agg")
    import h5py
    import pandas as pd

    from bumpcosmology_tpu.figures.plots import ppc_fig
    from bumpcosmology_tpu.pipeline.config import PipelineConfig
    from bumpcosmology_tpu.pipeline.stages import _stage_ppc
    from bumpcosmology_tpu.utils.io import write_table
    from bumpcosmology_tpu.utils.trace import Trace, save_trace

    d = calibrated_catalog
    nobs, nsamp = np.asarray(d.events.a).shape
    pe = pd.DataFrame({
        "evt": np.repeat([f"EV{i:03d}" for i in range(nobs)], nsamp),
        "m1": np.asarray(d.events.a).ravel(),
        "q": np.asarray(d.events.q).ravel(),
        "z": np.asarray(d.events.c).ravel(),
        "wt": np.exp(np.asarray(d.events.log_pdraw)).ravel(),
    })
    sel = pd.DataFrame({
        "m1": np.asarray(d.selection.a),
        "q": np.asarray(d.selection.q),
        "z": np.asarray(d.selection.c),
        "pdraw": np.exp(np.asarray(d.selection.log_pdraw)),
        "ndraw": float(np.exp(np.asarray(d.selection.log_ndraw))),
    })
    cfg = PipelineConfig()
    cfg.paths.data_dir = str(tmp_path)
    cfg.fit.n_grid = 128
    cfg.ppc.n_draws = 32
    cfg.ppc.batch = 16
    write_table(tmp_path / "pe-samples.h5", pe, key="samples")
    write_table(tmp_path / "selection-samples.h5", sel, key="samples")
    save_trace(
        tmp_path / "trace.h5",
        Trace(_point_posterior(TRUTH, 64), {}, coords={}, attrs={"model": "pop"}),
    )

    out = _stage_ppc(cfg)
    with h5py.File(out) as f:
        assert "pop" in f
        for col in ("a", "q", "c"):
            assert 0.0 <= f["pop"][col].attrs["p_value"] <= 1.0
            assert f["pop"][col]["pred_cdf_q"].shape[0] == 3

    fig = ppc_fig(out, out=tmp_path / "ppc.pdf")
    assert fig.exists() and fig.stat().st_size > 0
