"""Score-identity diagnostic (inference/score_check.py).

The harness math is pinned on an exact conjugate toy (where the score
identity holds analytically and a deliberate mismatch must be flagged), and
the pipeline stage is smoke-tested end-to-end at tiny scale in the slow tier.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bumpcosmology_tpu.inference.score_check import (
    ScoreCheckResult,
    score_identity_check,
)


def _toy_term_grads(mu0, shift=0.0):
    """Event term = Σ log N(y; μ, 1); selection term = Σ log N(y; μ−shift, 1).

    With ``shift=0`` both terms have zero expected score at μ₀ when y really
    comes from N(μ₀, 1); a nonzero shift biases the selection term only."""

    def term_grads(data):
        y = jnp.asarray(data)

        def ev(mu):
            return -0.5 * jnp.sum((y - mu[0]) ** 2)

        def sel(mu):
            return -0.5 * jnp.sum((y - mu[0] + shift) ** 2)

        mu = jnp.asarray([mu0])
        return jax.grad(ev)(mu), jax.grad(sel)(mu)

    return term_grads


def _toy_simulate(rng, sites):
    return rng.normal(sites["mu"], 1.0, size=64)


def test_score_identity_passes_on_matched_toy():
    res = score_identity_check(
        _toy_simulate, {"mu": 1.3}, _toy_term_grads(1.3), ("mu",),
        n_catalogs=300, seed=5,
    )
    assert isinstance(res, ScoreCheckResult)
    assert res.mean.shape == (3, 1)
    # event-term score per catalog is Σ(y-μ₀) ~ N(0, 64): se ≈ 8/√300
    assert res.se[0, 0] == pytest.approx(8.0 / np.sqrt(300.0), rel=0.2)
    assert res.max_abs_z() < 4.0
    assert "TOTAL" in res.table()


def test_score_identity_flags_mismatch():
    """A 0.25σ generative shift in one term must be detected (z >> 4) and
    attributed to that term, not the other."""
    res = score_identity_check(
        _toy_simulate, {"mu": 1.3}, _toy_term_grads(1.3, shift=0.25), ("mu",),
        n_catalogs=300, seed=6,
    )
    assert abs(res.z[0, 0]) < 4.0  # event term clean
    assert abs(res.z[1, 0]) > 10.0  # selection term flagged
    assert res.max_abs_z() > 10.0


@pytest.mark.slow
def test_stage_score_check_smoke(tmp_path):
    """pipeline score_check at tiny scale: artifact layout + finite z for
    both families (the plpeak arm exercises the family-generalized
    simulator through the stage path)."""
    import h5py

    from bumpcosmology_tpu.pipeline.config import PipelineConfig
    from bumpcosmology_tpu.pipeline.stages import _stage_score_check

    for model in ("pop_cosmo", "plpeak_cosmo"):
        cfg = PipelineConfig()
        cfg.paths.data_dir = str(tmp_path / model)
        (tmp_path / model).mkdir()
        cfg.score.model = model
        cfg.score.n_catalogs = 6
        cfg.score.nobs = 3
        cfg.score.nsamp = 8
        cfg.score.nsel = 24
        cfg.score.campaign_ndraw = 24_000
        cfg.score.pe_bank_size = 512
        cfg.score.threshold = 10.0
        cfg.score.n_grid = 64
        cfg.score.n_z = 128
        cfg.score.seed = 99
        cfg.mock.snr_chunk = 8192
        _stage_score_check(cfg)
        with h5py.File(cfg.paths.path("score_check.h5")) as f:
            assert f.attrs["model"] == model
            z = np.asarray(f["z"])
            assert z.shape[0] == 3 and np.all(np.isfinite(z))
            assert len(f["site"]) == z.shape[1]
