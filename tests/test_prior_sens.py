"""Prior-sensitivity reweighting (inference/prior_sens.py + `prior_sens` stage).

The core identity is checked against the conjugate-normal analytic answer:
reweighting exact posterior draws from prior N(0, τ²) to prior N(0, τ'²)
must produce the normal with precision 1/sp² + 1/τ'² − 1/τ² (complete the
square), to MC error.  The battery and stage are then exercised end-to-end.
"""
import math

import numpy as np
import pytest

from bumpcosmology_tpu.inference.distributions import Normal, TruncatedNormal, Uniform
from bumpcosmology_tpu.inference.prior_sens import (
    prior_sensitivity_suite,
    reweight_posterior,
    scaled_prior,
)


def test_reweight_matches_conjugate_normal():
    rng = np.random.default_rng(0)
    mu_p, s_p = 1.0, 0.8  # posterior under the old prior N(0, tau^2)
    tau, tau_new = 2.0, 1.0
    draws = rng.normal(mu_p, s_p, 400_000)
    res = reweight_posterior(
        {"theta": draws}, {"theta": Normal(0.0, tau)}, {"theta": Normal(0.0, tau_new)},
        name="tighten", site="theta",
    )
    prec = 1.0 / s_p**2 + 1.0 / tau_new**2 - 1.0 / tau**2
    want_mean = (mu_p / s_p**2) / prec
    want_sd = 1.0 / math.sqrt(prec)
    assert res.mean["theta"] == pytest.approx(want_mean, abs=3e-3)
    assert res.sd["theta"] == pytest.approx(want_sd, abs=3e-3)
    assert 0.3 < res.ess_frac <= 1.0


def test_identity_reweight_is_noop():
    rng = np.random.default_rng(1)
    draws = {"x": rng.normal(0.3, 1.1, 50_000)}
    res = reweight_posterior(draws, {"x": Normal(0.0, 2.0)}, {"x": Normal(0.0, 2.0)})
    assert res.ess_frac == pytest.approx(1.0, abs=1e-9)
    assert res.shift_sd["x"] == pytest.approx(0.0, abs=1e-9)
    assert res.sd_ratio["x"] == pytest.approx(1.0, abs=1e-9)


def test_zero_support_raises():
    draws = {"x": np.full(100, 5.0)}
    with pytest.raises(ValueError):
        reweight_posterior(draws, {"x": Uniform(0.0, 10.0)}, {"x": Uniform(0.0, 1.0)})


def test_scaled_prior_families():
    tn = scaled_prior(TruncatedNormal(0.7, 0.2, low=0.35, high=1.4), 2.0)
    assert isinstance(tn, TruncatedNormal)
    assert tn.scale == pytest.approx(0.4)
    assert tn.low == 0.35 and tn.high == 1.4  # hard bounds preserved
    n = scaled_prior(Normal(0.0, 2.0), 0.5)
    assert n.scale == pytest.approx(1.0)
    assert scaled_prior(Uniform(0.0, 1.0), 2.0) is None  # cannot widen hard bounds
    u = scaled_prior(Uniform(0.0, 1.0), 0.5)
    assert (u.low, u.high) == (pytest.approx(0.25), pytest.approx(0.75))


def test_suite_on_fake_posterior():
    rng = np.random.default_rng(2)
    priors = {
        "h": TruncatedNormal(0.7, 0.2, low=0.35, high=1.4),
        "beta": Normal(0.0, 2.0),
        "log_fpl": Uniform(math.log(1e-3), math.log(0.5)),
    }
    post = {
        "h": rng.normal(0.68, 0.05, (2, 500)),
        # centered on the prior mean: an off-center posterior is *correctly*
        # pulled toward the mean by a tightened prior (tested separately via
        # the conjugate oracle), which is not what this smoke probes
        "beta": rng.normal(0.0, 0.3, (2, 500)),
        # keep this inside the x0.5-narrowed interval [-5.36, -2.25]: a
        # posterior that leaks past the narrowed bound is *correctly*
        # reported as a large shift, which is not what this test probes
        "log_fpl": rng.uniform(math.log(0.02), math.log(0.05), (2, 500)),
    }
    results = prior_sensitivity_suite(post, priors)
    names = {r.name for r in results}
    assert "h: scale x2" in names and "h: scale x0.5" in names
    assert "log_fpl: scale x0.5" in names
    assert "log_fpl: scale x2" not in names  # widening a Uniform is a no-op
    for r in results:
        assert 0.0 < r.ess_frac <= 1.0
        assert set(r.shift_sd) == set(priors)
    # the posterior here is far tighter than any prior: shifts must be small
    small = [abs(r.shift_sd[r.site]) for r in results if r.ess_frac > 0.3]
    assert small and max(small) < 0.5


def test_stage_and_figure(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import h5py

    from bumpcosmology_tpu.figures.plots import prior_sens_fig
    from bumpcosmology_tpu.inference.likelihoods import POP_PRIORS
    from bumpcosmology_tpu.pipeline.config import PipelineConfig
    from bumpcosmology_tpu.pipeline.stages import _stage_prior_sens
    from bumpcosmology_tpu.utils.trace import Trace, save_trace

    rng = np.random.default_rng(3)
    post = {}
    for name, dist in POP_PRIORS.items():
        x = np.asarray(dist.sample(__import__("jax").random.PRNGKey(hash(name) % 2**31), (2, 400)))
        post[name] = x * 0.1 + np.median(x)  # tight, inside support
    cfg = PipelineConfig()
    cfg.paths.data_dir = str(tmp_path)
    save_trace(tmp_path / "trace.h5", Trace(post, {}, coords={}, attrs={"model": "pop"}))

    out = _stage_prior_sens(cfg)
    with h5py.File(out) as f:
        assert "pop" in f
        g = f["pop"]
        n_pert, n_sites = g["shift_sd"].shape
        assert n_sites == len(POP_PRIORS)
        assert len(g["ess_frac"]) == n_pert
        assert np.all(np.isfinite(g["shift_sd"][:]))

    fig = prior_sens_fig(out, out=tmp_path / "ps.pdf")
    assert fig.exists() and fig.stat().st_size > 0
