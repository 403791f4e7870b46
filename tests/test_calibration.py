"""SBC harness smoke test (plumbing + rank mechanics, not full calibration)."""
import jax
import numpy as np
import pytest

from bumpcosmology_tpu.inference.calibration import (
    make_mock_pop_cosmo_simulator,
    make_mock_pop_simulator,
    make_pop_cosmo_sbc_spec_builder,
    make_pop_sbc_spec_builder,
    run_sbc,
    sbc_uniformity_pvalues,
)
from bumpcosmology_tpu.mock import add_observation_noise, draw_injection_campaign


@pytest.mark.slow
def test_sbc_harness_smoke():
    inj = draw_injection_campaign(ndraw=60_000, seed=5, snr_chunk=8192)
    obs = add_observation_noise(inj, seed=6, threshold=20.0)
    assert len(obs) > 20  # 60k draws yield ~37 at threshold 20 (P1200087-pinned PSDs)

    simulate = make_mock_pop_simulator(
        obs, n_total_injections=len(inj), nobs=6, nsamp=32, nsel=128,
        pe_bank_size=512, seed=7,
    )
    ranks = run_sbc(
        make_pop_sbc_spec_builder(n_grid=64),
        simulate,
        n_sims=3,
        key=jax.random.PRNGKey(8),
        num_warmup=100,
        num_samples=64,
        thin=4,
        verbose=False,
    )
    n_bins = int(ranks["__n_bins__"])
    assert n_bins == 64 // 4 + 1
    for site, r in ranks.items():
        if site == "__n_bins__":
            continue
        assert r.shape == (3,)
        assert np.all((r >= 0) & (r < n_bins))
    # R_unit excluded by default
    assert "R_unit" not in ranks
    pvals = sbc_uniformity_pvalues(ranks)
    assert all(0.0 <= p <= 1.0 for p in pvals.values())


@pytest.mark.slow
def test_pop_cosmo_simulator_produces_valid_data():
    """Joint-model simulator: detector-frame data, finite weights, correct shapes."""
    from bumpcosmology_tpu.inference.model import constrain, prior_sample
    import jax.numpy as jnp

    inj = draw_injection_campaign(ndraw=30_000, seed=15, snr_chunk=8192)
    obs = add_observation_noise(inj, seed=16, threshold=20.0)
    nsel = min(64, len(obs))  # campaign yields ~50 detections at threshold 20
    simulate = make_mock_pop_cosmo_simulator(
        obs, n_total_injections=len(inj), nobs=5, nsamp=16, nsel=nsel,
        pe_bank_size=512, seed=17,
    )
    builder = make_pop_cosmo_sbc_spec_builder(n_grid=64, n_z=128)
    proto = builder(None)
    assert set(proto.priors) >= {"h", "Om", "w", "mpisn", "lam"}

    rng = np.random.default_rng(18)
    sites = {
        k: np.asarray(v)
        for k, v in constrain(proto, prior_sample(proto, jax.random.PRNGKey(19))).items()
    }
    data = simulate(rng, sites)
    assert data.events.a.shape == (5, 16)
    assert data.selection.a.shape == (nsel,)
    # detector-frame masses exceed source frame: m1_det = m1 (1+z) > 5
    assert np.all(np.asarray(data.events.a) > 5.0)
    assert np.all(np.isfinite(np.asarray(data.events.log_pdraw)))
    assert np.all(np.isfinite(np.asarray(data.selection.log_pdraw)))

    # the spec's potential is finite and differentiable at a prior draw
    from bumpcosmology_tpu.inference.model import make_potential

    spec = builder(data)
    theta = prior_sample(spec, jax.random.PRNGKey(20))
    u, g = jax.value_and_grad(make_potential(spec))(theta)
    assert np.isfinite(np.asarray(u))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_sbc_harness_joint_model_smoke():
    """run_sbc end-to-end on the joint model (2 sims, tiny fits)."""
    inj = draw_injection_campaign(ndraw=30_000, seed=25, snr_chunk=8192)
    obs = add_observation_noise(inj, seed=26, threshold=20.0)
    simulate = make_mock_pop_cosmo_simulator(
        obs, n_total_injections=len(inj), nobs=5, nsamp=16, nsel=64,
        pe_bank_size=512, seed=27,
    )
    ranks = run_sbc(
        make_pop_cosmo_sbc_spec_builder(n_grid=64, n_z=128),
        simulate,
        n_sims=2,
        key=jax.random.PRNGKey(28),
        num_warmup=100,
        num_samples=64,
        thin=4,
        verbose=False,
    )
    n_bins = int(ranks["__n_bins__"])
    for site in ("h", "Om", "w", "mpisn"):
        assert site in ranks
        assert np.all((ranks[site] >= 0) & (ranks[site] < n_bins))


@pytest.mark.slow
def test_run_sbc_fleet_joint_model_smoke():
    """Vectorized fleet SBC (one compile for all sims) on the joint model."""
    from bumpcosmology_tpu.inference.calibration import run_sbc_fleet
    from bumpcosmology_tpu.inference.likelihoods import dl_bounds_of, pop_cosmo_loglike

    inj = draw_injection_campaign(ndraw=30_000, seed=35, snr_chunk=8192)
    obs = add_observation_noise(inj, seed=36, threshold=20.0)
    simulate = make_mock_pop_cosmo_simulator(
        obs, n_total_injections=len(inj), nobs=4, nsamp=16,
        nsel=min(32, len(obs)), pe_bank_size=256, seed=37,
    )
    proto = make_pop_cosmo_sbc_spec_builder(n_grid=64, n_z=128)(None)

    def make_loglike(datas):
        bounds = dl_bounds_of(datas, margin=0.1)
        return lambda sites, d: pop_cosmo_loglike(sites, d, 64, 128, bounds)

    ranks = run_sbc_fleet(
        proto, make_loglike, simulate, n_sims=4,
        key=jax.random.PRNGKey(38), num_warmup=75, num_samples=48, thin=4,
        verbose=False,
    )
    n_bins = int(ranks["__n_bins__"])
    assert n_bins == 48 // 4 + 1
    for site in ("h", "Om", "w", "mpisn", "sigma"):
        assert ranks[site].shape == (4,)
        assert np.all((ranks[site] >= 0) & (ranks[site] < n_bins))
    assert "R_unit" not in ranks


@pytest.mark.slow
def test_fresh_noise_simulator_snr_channel():
    """Fresh-noise joint simulator with the observed-SNR channel conditioned
    into the PE banks (the round-3 λ-calibration fix): valid detector-frame
    data, finite weights, and a finite differentiable potential."""
    from bumpcosmology_tpu.inference.calibration import (
        make_mock_pop_cosmo_simulator_fresh,
    )
    from bumpcosmology_tpu.inference.model import constrain, make_potential, prior_sample

    inj = draw_injection_campaign(ndraw=80_000, seed=35, snr_chunk=8192)
    builder = make_pop_cosmo_sbc_spec_builder(n_grid=64, n_z=128)
    proto = builder(None)
    rng = np.random.default_rng(36)
    sites = {
        k: np.asarray(v)
        for k, v in constrain(proto, prior_sample(proto, jax.random.PRNGKey(37))).items()
    }
    for snr_channel in (False, True):
        simulate = make_mock_pop_cosmo_simulator_fresh(
            inj, nobs=4, nsamp=16, nsel=48, pe_bank_size=1024,
            threshold=10.0, snr_channel=snr_channel, max_bank_doublings=2,
        )
        data = simulate(rng, sites)
        assert data.events.a.shape == (4, 16)
        assert data.selection.a.shape == (48,)
        assert np.all(np.asarray(data.events.a) > 5.0)
        assert np.all(np.isfinite(np.asarray(data.events.log_pdraw)))
        assert np.all(np.isfinite(np.asarray(data.selection.log_pdraw)))
        spec = builder(data)
        theta = prior_sample(spec, jax.random.PRNGKey(38))
        u, g = jax.value_and_grad(make_potential(spec))(theta)
        assert np.isfinite(np.asarray(u))
        assert np.all(np.isfinite(np.asarray(g)))


def test_write_sbc_artifact_verdict_datasets(tmp_path):
    """The SBC artifact carries per-site verdicts as datasets, not just attrs."""
    import h5py

    from bumpcosmology_tpu.pipeline.stages import write_sbc_artifact

    ranks = {"lam": np.arange(8), "h": np.arange(8), "__n_bins__": 64}
    pvals = {"lam": 0.002, "h": 0.73}
    bad = write_sbc_artifact(tmp_path / "r.h5", "pop_cosmo", 8, ranks, pvals)
    assert bad == ["lam"]
    with h5py.File(tmp_path / "r.h5") as f:
        assert not f.attrs["all_pass"]
        assert int(f.attrs["n_sims"]) == 8
        sites = [s.decode() for s in f["pvalues/site"][:]]
        p = dict(zip(sites, f["pvalues/p"][:]))
        passed = dict(zip(sites, f["pvalues/passed"][:]))
        assert p["lam"] == pytest.approx(0.002) and not passed["lam"]
        assert p["h"] == pytest.approx(0.73) and passed["h"]
        # older-layout readers (figures/plots.py) still see per-site attrs
        assert dict(f["pvalues"].attrs)["h"] == pytest.approx(0.73)


def test_bank_floor_enforced_and_law_preserved(capsys):
    """Round-5 bank-quality enforcement: with a deliberately tiny initial
    bank the simulator must (a) clear the 2*nsamp Neff floor via adaptive
    moment-matched proposals (zero sub-bar warnings), and (b) leave the
    estimated per-event law unchanged — the resampled banks from the tiny
    (adaptive) and large (plain) runs agree in location within MC error."""
    from bumpcosmology_tpu.inference.calibration import (
        make_mock_pop_cosmo_simulator_fresh,
        make_pop_cosmo_sbc_spec_builder,
    )
    from bumpcosmology_tpu.inference.model import constrain, prior_sample

    inj = draw_injection_campaign(ndraw=80_000, seed=35, snr_chunk=8192)
    proto = make_pop_cosmo_sbc_spec_builder(n_grid=64, n_z=128)(None)
    sites = {
        k: np.asarray(v)
        for k, v in constrain(proto, prior_sample(proto, jax.random.PRNGKey(41))).items()
    }
    datas = {}
    for label, bank in [("tiny", 64), ("big", 8192)]:
        simulate = make_mock_pop_cosmo_simulator_fresh(
            inj, nobs=4, nsamp=64, nsel=48, pe_bank_size=bank,
            threshold=10.0, snr_channel=True, max_bank_doublings=2,
        )
        # same rng seed => identical noise draws, detected pools, events and
        # observed data — only the banks differ (different proposals)
        datas[label] = simulate(np.random.default_rng(42), sites)
    out = capsys.readouterr().out
    assert "bank Neff" not in out, f"sub-floor bank survived:\n{out}"

    a_t = np.asarray(datas["tiny"].events.a)
    a_b = np.asarray(datas["big"].events.a)
    for e in range(a_t.shape[0]):
        lt, lb = np.log(a_t[e]), np.log(a_b[e])
        pooled = np.sqrt(0.5 * (lt.var() + lb.var())) + 1e-6
        assert abs(lt.mean() - lb.mean()) < 1.0 * pooled, (
            f"event {e}: bank location shifted by "
            f"{abs(lt.mean()-lb.mean())/pooled:.2f} pooled sd"
        )


def test_rate_reconstruction_calibrated_at_catalog_scale():
    """The Gaussian R reconstruction is rank-calibrated at nobs ~ 56 within
    its own O(1/sqrt(n)) approximation error: KS p >= 0.01 at suite scale,
    and 90% central-interval coverage within a point of nominal."""
    from scipy.stats import kstest

    from bumpcosmology_tpu.inference.calibration import rate_reconstruction_ranks

    rng = np.random.default_rng(7)
    # mu varies across trials like prior-draw selection estimates do
    # (log-normal spread ~0.5 dex around the catalog scale mu ~ 24)
    mu = np.exp(rng.normal(np.log(24.0), 0.5, size=2048))
    ranks = rate_reconstruction_ranks(mu, r_true=2.3, rng=rng)
    assert np.all((ranks >= 0.0) & (ranks <= 1.0))
    p = kstest(ranks, "uniform").pvalue
    assert p >= 0.01, f"rate reconstruction rank uniformity rejected: p={p:.2e}"
    # 90% central interval: rank in (0.05, 0.95)
    cov = np.mean((ranks > 0.05) & (ranks < 0.95))
    assert abs(cov - 0.90) < 0.025, f"90% coverage came out {cov:.3f}"


def test_rate_reconstruction_detects_broken_reconstruction():
    """Negative control: a reconstruction with the wrong scale fails the
    same uniformity test (the check has teeth)."""
    from scipy.special import ndtr
    from scipy.stats import kstest

    rng = np.random.default_rng(8)
    mu = np.exp(rng.normal(np.log(24.0), 0.5, size=2048))
    nobs = rng.poisson(2.3 * mu)
    # wrong width: sqrt(nobs)/mu inflated 2x
    bad = ndtr((2.3 - nobs / mu) * mu / (2.0 * np.sqrt(np.maximum(nobs, 1))))
    assert kstest(bad, "uniform").pvalue < 1e-6
