"""Simulation-based calibration (SBC) harness.

Validates the whole inference stack (priors → simulator → likelihood → NUTS)
by the rank statistic of Talts et al. (2018): draw hyperparameters from the
prior, simulate a catalog, fit, and record the rank of the true value among
the (thinned) posterior draws; ranks must be uniform.  This is the
"multi-chain calibration suite" of the scale-out configs (BASELINE.md) — the
reference has no calibration machinery at all (SURVEY.md §4).

Design notes for the mock-population simulator
(:func:`make_mock_pop_simulator`):

* The PE-sample banks are **θ-independent**: mock PE samples are drawn from
  (measurement likelihood × fiducial population) with ``pdraw`` recorded, a
  valid importance proposal for *any* hyperparameter draw — so they are
  precomputed once per detected injection and reused across simulations.
  Only the event *selection* (which injections make the catalog) depends on
  the prior draw, making each simulation O(nobs) work.
* Catalogs are conditioned on a fixed event count ``nobs`` (fixed shapes for
  one XLA compilation across all simulations); the rate parameter is
  therefore excluded from the rank check (``R_unit`` remains prior-uniform
  by construction).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import numpy as np

from bumpcosmology_tpu.inference.likelihoods import (
    PopData,
    make_pop_data,
    pop_model_spec,
    population_from_sites,
)
from bumpcosmology_tpu.inference.model import ModelSpec, constrain, prior_sample
from bumpcosmology_tpu.inference.sampler import fit
from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv

__all__ = [
    "run_sbc",
    "run_sbc_fleet",
    "make_mock_pop_simulator",
    "make_mock_pop_cosmo_simulator",
    "make_mock_pop_cosmo_simulator_fresh",
    "make_pop_sbc_spec_builder",
    "make_pop_cosmo_sbc_spec_builder",
    "make_plpeak_cosmo_sbc_spec_builder",
    "make_brokenpl_cosmo_sbc_spec_builder",
    "sbc_uniformity_pvalues",
    "rate_reconstruction_ranks",
    "selection_mu_samples",
]


def rate_reconstruction_ranks(
    mu_samples: np.ndarray, r_true: float, rng: np.random.Generator
) -> np.ndarray:
    """Frequentist rank-calibration of the rate reconstruction (round-5).

    The rate ``R`` is never a fitted site: the reference derives it post hoc
    through the unit-normal reparameterization ``R = nobs/mu +
    sqrt(nobs)/mu * R_unit`` (``intensity_models.py:348-349``) — the Gaussian
    approximation to the Poisson rate posterior under an (improper) flat
    prior.  The SBC fleets condition on a fixed ``nobs`` (fixed XLA shapes),
    so ``R`` has no rank there *by construction*; this check calibrates the
    reconstruction path itself on its own terms: for each trial, draw
    ``nobs ~ Poisson(r_true * mu)`` (``mu`` from prior-draw selection
    estimates — the theta-mixing the real pipeline sees) and compute the
    reconstruction's CDF at the truth,

        rank = Phi((r_true - nobs/mu) * mu / sqrt(nobs)).

    Under a calibrated reconstruction the ranks are U(0,1); the residual
    non-uniformity IS the Gaussian-vs-Poisson approximation error at
    catalog scale (O(1/sqrt(nobs)) Edgeworth skew-term, ~0.01 in CDF at
    nobs ≈ 56).  The mu-posterior width enters ``R`` one order below the
    sqrt(nobs)/mu term and is quantified in the artifact, not simulated.

    ``mu_samples``: expected detected counts per trial (r=1 units, i.e.
    mu = exp(log_mu_sel) * T_obs); ``nobs = 0`` trials (probability
    e^{-r*mu}, negligible at catalog scale) get the exact rank of the
    degenerate reconstruction, 1.0.
    """
    from scipy.special import ndtr

    mu = np.asarray(mu_samples, dtype=np.float64)
    nobs = rng.poisson(r_true * mu)
    with np.errstate(divide="ignore", invalid="ignore"):
        rank = ndtr((r_true - nobs / mu) * mu / np.sqrt(np.maximum(nobs, 1)))
    return np.where(nobs == 0, 1.0, rank)


def selection_mu_samples(
    campaign,
    family: str,
    n_trials: int,
    key,
    threshold: float = 20.0,
    target_nobs: float = 56.0,
    r_true: float = 2.3,
):
    """Per-prior-draw selection estimates mu(theta) for the rate check.

    Evaluates the model's own selection estimator — exp(logsumexp(log dN -
    log pdraw) - log Ndraw) over the campaign's detected pool — at
    ``n_trials`` joint-prior draws, then rescales so the median expected
    count ``r_true * mu`` equals ``target_nobs`` (the mock campaign's
    horizon/threshold differ from O3's, so the absolute count is arbitrary;
    the theta-driven *relative* spread is what the coverage study needs).
    """
    import math as _math

    import jax.numpy as jnp

    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
    from bumpcosmology_tpu.inference.likelihoods import (
        _cosmo_frame_logwts,
        cosmo_from_sites,
    )
    from bumpcosmology_tpu.models.cosmology import build_cosmology

    snr = campaign["SNR"].to_numpy()
    det = snr > threshold
    m1 = campaign["m1"].to_numpy()[det]
    q = campaign["q"].to_numpy()[det]
    z = campaign["z"].to_numpy()[det]
    pdraw_src = campaign["pdraw_mqz"].to_numpy()[det]
    m1d = jnp.asarray(m1 * (1.0 + z))
    qj = jnp.asarray(q)
    dl = jnp.asarray(planck18_dl_np(z))
    log_pdraw = jnp.asarray(np.log(pdraw_src * dm1sqz_dm1ddqdl(m1, q, z)))
    log_ndraw = _math.log(float(len(campaign)))

    if family == "plpeak":
        from bumpcosmology_tpu.inference.likelihoods import plpeak_from_sites
        from bumpcosmology_tpu.models.plpeak import build_plpeak_population

        def build_pop(sites):
            return build_plpeak_population(plpeak_from_sites(sites))

        proto = make_plpeak_cosmo_sbc_spec_builder()(None)
    elif family == "brokenpl":
        from bumpcosmology_tpu.inference.likelihoods import brokenpl_from_sites
        from bumpcosmology_tpu.models.brokenpl import build_brokenpl_population

        def build_pop(sites):
            return build_brokenpl_population(brokenpl_from_sites(sites))

        proto = make_brokenpl_cosmo_sbc_spec_builder()(None)
    else:

        def build_pop(sites):
            return build_population(population_from_sites(sites))

        proto = make_pop_cosmo_sbc_spec_builder()(None)

    from jax.scipy.special import logsumexp as _lse

    def log_mu(theta):
        sites = constrain(proto, theta)
        pop = build_pop(sites)
        cosmo = build_cosmology(cosmo_from_sites(sites))
        lw = _cosmo_frame_logwts(pop, cosmo, m1d, qj, dl, log_pdraw)
        return _lse(lw) - log_ndraw

    thetas = jax.vmap(lambda k: prior_sample(proto, k))(jax.random.split(key, n_trials))
    log_mus = np.asarray(jax.lax.map(jax.jit(log_mu), thetas), dtype=np.float64)
    mu = np.exp(log_mus - np.median(log_mus)) * (target_nobs / r_true)
    return mu


def run_sbc(
    make_spec: Callable[[object], ModelSpec],
    simulate: Callable[[np.random.Generator, Dict[str, np.ndarray]], object],
    n_sims: int,
    key,
    num_warmup: int = 200,
    num_samples: int = 256,
    num_chains: int = 1,
    thin: int = 4,
    skip_sites: Sequence[str] = ("R_unit",),
    seed: int = 0,
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
    """SBC loop: returns per-site rank arrays of shape (n_sims,).

    ``make_spec(data)`` must return a ModelSpec whose priors are the
    generating distribution of the θ draws; ``simulate(rng, sites)`` returns
    the data object for one prior draw.  Posterior draws are thinned by
    ``thin`` before ranking (reduces autocorrelation bias in the ranks).
    """
    rng = np.random.default_rng(seed)
    ranks: Dict[str, list] = {}
    n_bins = None
    for i in range(n_sims):
        key, k_prior, k_fit = jax.random.split(key, 3)
        # Draw θ from the prior using a throwaway spec (priors are static).
        proto_spec = make_spec(None)
        theta_true = prior_sample(proto_spec, k_prior)
        sites_true = {k: np.asarray(v) for k, v in constrain(proto_spec, theta_true).items()}

        data = simulate(rng, sites_true)
        spec = make_spec(data)
        res = fit(
            spec,
            k_fit,
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=num_chains,
            verbose=False,
        )
        for site, truth in sites_true.items():
            if site in skip_sites:
                continue
            draws = res.posterior[site].reshape(-1)[::thin]
            n_bins = len(draws)
            ranks.setdefault(site, []).append(int(np.sum(draws < truth)))
        if verbose:
            print(f"[sbc] sim {i + 1}/{n_sims} done", flush=True)
    out = {k: np.asarray(v) for k, v in ranks.items()}
    out["__n_bins__"] = np.asarray(n_bins + 1 if n_bins else 0)
    return out


def run_sbc_fleet(
    proto_spec: ModelSpec,
    make_loglike: Callable,
    simulate: Callable,
    n_sims: int,
    key,
    num_warmup: int = 300,
    num_samples: int = 256,
    thin: int = 4,
    skip_sites: Sequence[str] = ("R_unit",),
    seed: int = 0,
    verbose: bool = True,
    cfg=None,
    chunk_size: int = 25,
) -> Dict[str, np.ndarray]:
    """SBC with all simulations fit AS ONE vectorized fleet (one compile).

    The sequential :func:`run_sbc` recompiles the NUTS program for every
    simulation (each dataset closure is a new static potential) — minutes of
    XLA work per sim.  Here the datasets stack on a fleet axis and
    :func:`bumpcosmology_tpu.inference.fleet.fleet_fit` advances all
    single-chain fits in lockstep through shared jitted chunks.

    ``proto_spec``: a ModelSpec whose priors are the generating distribution
    (its loglike is unused).  ``make_loglike(stacked_datas) ->
    loglike(sites, data_slice)`` builds the data-as-argument likelihood
    (letting it capture fleet-wide static facts such as the dL table bounds).
    """
    import jax.numpy as jnp

    from bumpcosmology_tpu.inference.fleet import fleet_fit
    from bumpcosmology_tpu.inference.model import _log_prior_and_jac

    rng = np.random.default_rng(seed)
    theta_trues, sites_trues, datas_list = [], [], []
    for _ in range(n_sims):
        key, k_prior = jax.random.split(key)
        theta_true = prior_sample(proto_spec, k_prior)
        sites_true = {
            k: np.asarray(v) for k, v in constrain(proto_spec, theta_true).items()
        }
        theta_trues.append(theta_true)
        sites_trues.append(sites_true)
        datas_list.append(simulate(rng, sites_true))
    datas = jax.tree.map(lambda *xs: jnp.stack(xs), *datas_list)
    theta_true_arr = jnp.stack(theta_trues)
    if verbose:
        print(f"[sbc] {n_sims} simulations drawn; launching fleet fit", flush=True)

    loglike = make_loglike(datas)

    def make_pot(data):
        def pot(theta):
            sites = constrain(proto_spec, theta)
            return -(_log_prior_and_jac(proto_spec, theta) + loglike(sites, data))

        return pot

    # finite inits: prior candidates, truth as guaranteed-finite fallback
    key, k_cand, k_fit = jax.random.split(key, 3)
    n_cand = 16
    cands = jax.vmap(lambda k: prior_sample(proto_spec, k, shape=(n_cand,)))(
        jax.random.split(k_cand, n_sims)
    )  # (S, n_cand, dim)
    u = jax.jit(
        jax.vmap(lambda d, c: jax.vmap(make_pot(d))(c))
    )(datas, cands)
    finite = jnp.isfinite(u)
    idx = jnp.argmax(finite, axis=1)
    picked = jnp.take_along_axis(cands, idx[:, None, None], axis=1)[:, 0]
    theta0 = jnp.where(jnp.any(finite, axis=1)[:, None], picked, theta_true_arr)

    progress = None
    if verbose:
        def progress(phase, done, total):
            if done % 100 == 0 or done == total:
                print(f"[sbc/fleet] {phase} {done}/{total}", flush=True)

    from bumpcosmology_tpu.inference.nuts import NutsConfig

    res = fleet_fit(
        make_pot, datas, theta0, k_fit,
        num_warmup=num_warmup, num_samples=num_samples, progress=progress,
        cfg=cfg or NutsConfig(), chunk_size=chunk_size,
    )
    assert np.all(np.isfinite(np.asarray(res.thetas))), "non-finite fleet draws"

    post = {k: np.asarray(v) for k, v in constrain(proto_spec, res.thetas).items()}
    ranks: Dict[str, list] = {}
    n_bins = None
    for s in range(n_sims):
        for site, truth in sites_trues[s].items():
            if site in skip_sites:
                continue
            draws = post[site][s][::thin]
            n_bins = len(draws)
            ranks.setdefault(site, []).append(int(np.sum(draws < truth)))
    out = {k: np.asarray(v) for k, v in ranks.items()}
    out["__n_bins__"] = np.asarray(n_bins + 1 if n_bins else 0)
    return out


def sbc_uniformity_pvalues(ranks: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Per-site chi-square uniformity p-values over coarse rank bins."""
    import scipy.stats as ss

    n_bins_total = int(ranks["__n_bins__"])
    out = {}
    for site, r in ranks.items():
        if site == "__n_bins__":
            continue
        n = len(r)
        k = max(2, min(10, n // 5))  # coarse bins with >=5 expected each
        edges = np.linspace(0, n_bins_total, k + 1)
        counts, _ = np.histogram(r, bins=edges)
        chi2 = np.sum((counts - n / k) ** 2 / (n / k))
        out[site] = float(ss.chi2.sf(chi2, df=k - 1))
    return out


def make_mock_pop_simulator(
    detected_obs,
    n_total_injections: int,
    nobs: int = 16,
    nsamp: int = 64,
    nsel: int = 512,
    pe_bank_size: int = 2048,
    seed: int = 0,
):
    """Build a fast per-θ catalog simulator from one mock injection campaign.

    ``detected_obs``: DataFrame of detected injections with observation-noise
    columns (output of :func:`bumpcosmology_tpu.mock.add_observation_noise`).
    Precomputes a fiducial-population PE-sample bank per injection (see module
    docstring), then each call draws ``nobs`` events ∝ pop_θ / pdraw and
    importance-selects their PE samples.  The selection set is θ-independent.
    """
    from bumpcosmology_tpu.data.weights import default_pop_wt
    from bumpcosmology_tpu.mock.catalog import draw_mock_pe_samples

    rng0 = np.random.default_rng(seed)
    obs = detected_obs.reset_index(drop=True)

    # θ-independent selection set (uniform thinning: Ndraw scales with it)
    if nsel > len(obs):
        print(
            f"[sbc] WARNING: requested nsel={nsel} exceeds the detected pool "
            f"({len(obs)}); clamping — selection-MC noise will be higher than "
            "configured (grow the campaign to actually get nsel injections)"
        )
    nsel = min(nsel, len(obs))
    sel_idx = rng0.choice(len(obs), size=nsel, replace=False)
    sel = obs.iloc[sel_idx]
    sel_arrays = (
        sel["m1"].to_numpy(),
        sel["q"].to_numpy(),
        sel["z"].to_numpy(),
        sel["pdraw_mqz"].to_numpy(),
        float(n_total_injections) * (nsel / len(obs)),
    )

    # PE banks: samples from (measurement likelihood x fiducial pop), with
    # pdraw = fiducial pop weight — a valid proposal for any θ.
    banks = []
    for _, row in obs.iterrows():
        m, q, z, w = draw_mock_pe_samples(
            row["log_mc_obs"], row["sigma_log_mc"],
            row["q_obs"], row["sigma_q"],
            row["log_dl_obs"], row["sigma_log_dl"],
            size=pe_bank_size, output_source_frame=True, rng=rng0,
        )
        pw = default_pop_wt(m, q, z)
        rw = pw / w
        total = np.sum(rw)
        if total <= 0:
            banks.append(None)
            continue
        pick = rng0.choice(pe_bank_size, size=nsamp, p=rw / total)
        banks.append((m[pick], q[pick], z[pick], pw[pick]))

    valid = np.array([b is not None for b in banks])
    inj_m1 = obs["m1"].to_numpy()
    inj_q = obs["q"].to_numpy()
    inj_z = obs["z"].to_numpy()
    inj_pdraw = obs["pdraw_mqz"].to_numpy()

    def simulate(rng: np.random.Generator, sites) -> PopData:
        pop = build_population(population_from_sites(sites))
        log_dn = np.asarray(log_dndmdqdv(pop, inj_m1, inj_q, inj_z), dtype=np.float64)
        wt = np.where(valid, np.exp(log_dn) / inj_pdraw, 0.0)
        # comoving-volume measure is common to all θ up to the z-shape already
        # in log_dn; detection probability is encoded by membership in obs.
        from bumpcosmology_tpu.data.weights import planck18_dvc_dz_np

        wt = wt * planck18_dvc_dz_np(inj_z) / (1.0 + inj_z)
        total = wt.sum()
        if not np.isfinite(total) or total <= 0:
            wt = valid.astype(float)
            total = wt.sum()
        picks = rng.choice(len(obs), size=nobs, replace=True, p=wt / total)
        stacks = [np.stack([banks[i][j] for i in picks]) for j in range(4)]
        return make_pop_data(*stacks, *sel_arrays)

    return simulate


def make_mock_pop_cosmo_simulator(
    detected_obs,
    n_total_injections: int,
    nobs: int = 16,
    nsamp: int = 64,
    nsel: int = 2048,
    pe_bank_size: int = 4096,
    seed: int = 0,
):
    """Detector-frame catalog simulator for the JOINT (pop+cosmology) model.

    The key observation making joint-model SBC cheap: detector-frame
    observables (m1_det, q, dL) are *cosmology-invariant* — only the model's
    mapping back to source frame depends on (h, Om, w).  So the PE-sample
    banks and the selection set are θ-independent here too, exactly as in
    :func:`make_mock_pop_simulator`; each prior draw only re-weights which
    injections enter the catalog, via the θ-cosmology intensity × frame
    Jacobian at the injections' detector-frame coordinates
    (cf. ``intensity_models.py:357-390``).

    ``nsel`` defaults higher than the pop-only simulator: the joint posterior
    develops selection-MC pseudo-modes when ``nobs/sqrt(neff_sel)`` exceeds
    ~1 nat (docs/DESIGN.md §5a), which would corrupt every SBC rank.

    PE banks are stored with ``pdraw`` = fiducial detector-frame population
    weight: Gaussian-law draws come distributed as L·(1/m1d·dL) (that factor
    is the exact (logMc,q,logdL)→(m1d,q,dL) Jacobian), and are importance-
    resampled to L·p_fid_det — a statistically exact retarget, valid as an
    importance proposal for any θ.
    """
    import jax.numpy as jnp

    from bumpcosmology_tpu.data.weights import (
        default_pop_wt,
        dm1sqz_dm1ddqdl,
        planck18_dl_np,
        planck18_z_of_dl_np,
    )
    from bumpcosmology_tpu.inference.likelihoods import (
        _cosmo_frame_logwts,
        cosmo_from_sites,
        make_pop_cosmo_data,
    )
    from bumpcosmology_tpu.mock.catalog import draw_mock_pe_samples
    from bumpcosmology_tpu.models.cosmology import build_cosmology

    rng0 = np.random.default_rng(seed)
    obs = detected_obs.reset_index(drop=True)

    # detector-frame injection coordinates + pdraw (frame-converted once,
    # under the generating Planck18 — a property of the data, not of θ)
    inj_z = obs["z"].to_numpy()
    inj_m1 = obs["m1"].to_numpy()
    inj_q = obs["q"].to_numpy()
    inj_m1d = inj_m1 * (1.0 + inj_z)
    inj_dl = planck18_dl_np(inj_z)
    inj_pdraw_det = obs["pdraw_mqz"].to_numpy() * dm1sqz_dm1ddqdl(inj_m1, inj_q, inj_z)

    nsel = min(nsel, len(obs))
    sel_idx = rng0.choice(len(obs), size=nsel, replace=False)
    sel_arrays = (
        inj_m1d[sel_idx],
        inj_q[sel_idx],
        inj_dl[sel_idx],
        inj_pdraw_det[sel_idx],
        float(n_total_injections) * (nsel / len(obs)),
    )

    # Build every bank in one vectorized pass: the Gaussian measurement law
    # broadcasts over (events, bank) and the fiducial weight is ONE batched
    # device call instead of one eager call per event (the per-event loop
    # took ~30 min at an 8000-injection pool; this takes seconds).
    n_ev = len(obs)
    m1d_b, q_b, dl_b, w_b = draw_mock_pe_samples(
        obs["log_mc_obs"].to_numpy()[:, None], obs["sigma_log_mc"].to_numpy()[:, None],
        obs["q_obs"].to_numpy()[:, None], obs["sigma_q"].to_numpy()[:, None],
        obs["log_dl_obs"].to_numpy()[:, None], obs["sigma_log_dl"].to_numpy()[:, None],
        size=(n_ev, pe_bank_size), output_source_frame=False, rng=rng0,
    )
    z_b = planck18_z_of_dl_np(dl_b)
    m1_b = m1d_b / (1.0 + z_b)
    p_fid_det = np.empty_like(m1_b)
    chunk = max(1, 4_000_000 // pe_bank_size)
    for lo in range(0, n_ev, chunk):
        sl = slice(lo, lo + chunk)
        p_fid_det[sl] = default_pop_wt(m1_b[sl], q_b[sl], z_b[sl]) * dm1sqz_dm1ddqdl(
            m1_b[sl], q_b[sl], z_b[sl]
        )
    rw_b = p_fid_det / w_b
    banks = []
    n_low = 0
    for e in range(n_ev):
        total = np.sum(rw_b[e])
        # bank Neff floor (the reference's ingestion rejection, weighting.py:98-100):
        # a bank whose retarget weights are heavy-tailed cannot represent
        # L x p_fid and would corrupt the per-event marginal estimator
        neff = total * total / np.sum(rw_b[e] * rw_b[e]) if total > 0 else 0.0
        if not np.isfinite(total) or total <= 0 or neff < 2.0 * nsamp:
            banks.append(None)
            n_low += 1
            continue
        pick = rng0.choice(pe_bank_size, size=nsamp, p=rw_b[e] / total)
        banks.append((m1d_b[e, pick], q_b[e, pick], dl_b[e, pick], p_fid_det[e, pick]))
    if n_low:
        print(f"[sbc] {n_low}/{n_ev} pool injections rejected at the bank-Neff floor")

    valid = np.array([b is not None for b in banks])
    j_m1d = jnp.asarray(inj_m1d)
    j_q = jnp.asarray(inj_q)
    j_dl = jnp.asarray(inj_dl)
    j_log_pdraw = jnp.asarray(np.log(inj_pdraw_det))

    def simulate(rng: np.random.Generator, sites):
        pop = build_population(population_from_sites(sites))
        cosmo = build_cosmology(cosmo_from_sites(sites))
        logwt = np.asarray(
            _cosmo_frame_logwts(pop, cosmo, j_m1d, j_q, j_dl, j_log_pdraw),
            dtype=np.float64,
        )
        logwt = np.where(valid & np.isfinite(logwt), logwt, -np.inf)
        wt = np.exp(logwt - np.max(logwt))
        total = wt.sum()
        if not np.isfinite(total) or total <= 0:
            wt = valid.astype(float)
            total = wt.sum()
        # iid events (with replacement): the model's likelihood treats events
        # as iid draws from the normalized detected intensity; weighted
        # without-replacement sampling distorts catalogs whenever θ
        # concentrates weight on few pool injections (high-λ prior tails)
        picks = rng.choice(len(obs), size=nobs, replace=True, p=wt / total)
        stacks = [np.stack([banks[i][j] for i in picks]) for j in range(4)]
        return make_pop_cosmo_data(*stacks, *sel_arrays)

    return simulate


def make_mock_pop_cosmo_simulator_fresh(
    campaign,
    nobs: int = 16,
    nsamp: int = 64,
    nsel: int = 4096,
    pe_bank_size: int = 4096,
    threshold: float = 20.0,
    obs_sigma: float = None,
    snr_channel: bool = True,
    max_bank_doublings: int = 4,
    family: str = "bump",
):
    """Joint-model simulator with per-simulation FRESH noise (exact SBC law).

    :func:`make_mock_pop_cosmo_simulator` shares one observation-noise and
    PE-bank realization across every simulation.  That is efficient, but the
    shared realization acts as a *common-mode* likelihood tilt that does not
    average out over simulations — and the rank test feels it first in the
    most weakly identified direction (measured: a persistent one-sided λ
    rank bias that survives every MC-size increase, while all sharper sites
    pass).  Here every simulation redraws:

    * the observed detection SNRs (→ its own detected pool),
    * the fixed-size selection subset (which then also serves as the event
      pool, so the selection normalizer is exact for the per-sim discrete
      generative law),
    * the observed data and PE banks of its ``nobs`` selected events only
      (16 × bank_size work — cheap because banks are no longer shared).

    ``snr_channel=True`` closes the remaining structural mismatch — the
    round-2 λ rank failure.  The mock world detects on
    ``snr_obs = snr + N(0, √3)`` and sets the measurement σ's from it
    (``mock_observations.py:34,41-48`` semantics), so ``snr_obs`` is
    *observed data* whose likelihood ``g(snr_obs | m1d, q, dL) =
    E_Θ[N(snr_obs; A(m1d, m2d)·Θ/dL, √3)]`` carries distance information
    (fractional width √3/ρ ≈ 9 % at ρ = 20, comparable to σ_logdL = 0.2).
    The fitted per-event marginal omits it — the Mandel, Farr & Gair (2019)
    condition that selection/conditioning must be a function of the analyzed
    data is violated — which tilts every event posterior toward high
    P(detection) (low z) and biases the fit λ-high, one-sidedly,
    independently of every MC size.  The mock SNR kernel is *exactly*
    separable (``mock/snr.py``), so the fix is exact: fold one fresh Θ draw
    per bank sample into the proposal and multiply the bank retarget weights
    by ``N(snr_obs; A·Θ/dL, √3)`` — the resampled atoms then represent the
    posterior under the FULL data (d₃, snr_obs) with ``pdraw`` unchanged,
    and the flagship likelihood needs no modification.  (The reference's own
    mock branch carries the identical omission.)

    ``campaign``: the injection DataFrame WITH true SNR columns (θ- and
    noise-independent, computed once).

    ``family``: the intensity family the prior draws parameterize — ``"bump"``
    (:func:`population_from_sites`) or ``"plpeak"``
    (:func:`~bumpcosmology_tpu.inference.likelihoods.plpeak_from_sites`).
    Everything downstream of the per-θ intensity evaluation is
    family-agnostic (banks, noise, selection, the SNR channel).
    """
    import math as _math

    import jax.numpy as jnp

    from bumpcosmology_tpu.data.weights import (
        default_pop_wt,  # noqa: F401  (parity with the shared-bank factory)
        dm1sqz_dm1ddqdl,
        planck18_dl_np,
        planck18_z_of_dl_np,
    )
    from bumpcosmology_tpu.inference.likelihoods import (
        _cosmo_frame_logwts,
        cosmo_from_sites,
        make_pop_cosmo_data,
    )
    from bumpcosmology_tpu.mock.catalog import (
        CHIRP_DIST_MIN,
        Z_HORIZON,
        Uncertainties,
        draw_mock_pe_samples,
    )
    from bumpcosmology_tpu.mock.snr import amplitude_factor, draw_projection_factors
    from bumpcosmology_tpu.models.cosmology import build_cosmology

    snr = campaign["SNR"].to_numpy()
    m1 = campaign["m1"].to_numpy()
    q = campaign["q"].to_numpy()
    z = campaign["z"].to_numpy()
    pdraw_src = campaign["pdraw_mqz"].to_numpy()
    n_total = float(len(campaign))

    if family == "plpeak":
        from bumpcosmology_tpu.inference.likelihoods import plpeak_from_sites
        from bumpcosmology_tpu.models.plpeak import build_plpeak_population

        def build_pop(sites):
            return build_plpeak_population(plpeak_from_sites(sites))

    elif family == "brokenpl":
        from bumpcosmology_tpu.inference.likelihoods import brokenpl_from_sites
        from bumpcosmology_tpu.models.brokenpl import build_brokenpl_population

        def build_pop(sites):
            return build_brokenpl_population(brokenpl_from_sites(sites))

    elif family == "bump":

        def build_pop(sites):
            return build_population(population_from_sites(sites))

    else:
        raise ValueError(f"unknown intensity family {family!r}")

    m1d = m1 * (1.0 + z)
    dl = planck18_dl_np(z)
    pdraw_det = pdraw_src * dm1sqz_dm1ddqdl(m1, q, z)
    mc_det = m1d * q**0.6 / (1.0 + q) ** 0.2
    log_mc_det = np.log(mc_det)
    log_dl = np.log(dl)

    # only injections that can plausibly detect matter for the noise draw
    cand = np.flatnonzero(snr > threshold - 6.0 * _math.sqrt(3.0))

    def simulate(rng: np.random.Generator, sites):
        # fresh detection realization (mock_observations.py:34 semantics)
        snr_obs = snr[cand] + rng.normal(0.0, _math.sqrt(3.0), size=len(cand))
        det = cand[snr_obs > threshold]
        snr_obs = snr_obs[snr_obs > threshold]
        if len(det) < nsel:
            raise ValueError(
                f"only {len(det)} detections at threshold {threshold}; "
                "increase the campaign or lower nsel"
            )
        # fixed-size selection subset == the event pool (exact normalizer)
        pick_sel = rng.choice(len(det), size=nsel, replace=False)
        pool = det[pick_sel]
        pool_snr_obs = snr_obs[pick_sel]
        ndraw_eff = n_total * (nsel / len(det))

        pop = build_pop(sites)
        cosmo = build_cosmology(cosmo_from_sites(sites))
        logwt = np.asarray(
            _cosmo_frame_logwts(
                pop, cosmo,
                jnp.asarray(m1d[pool]), jnp.asarray(q[pool]), jnp.asarray(dl[pool]),
                jnp.asarray(np.log(pdraw_det[pool])),
            ),
            dtype=np.float64,
        )
        logwt = np.where(np.isfinite(logwt), logwt, -np.inf)
        wt = np.exp(logwt - np.max(logwt))
        events = rng.choice(nsel, size=nobs, replace=True, p=wt / wt.sum())
        ev = pool[events]

        # fresh observed data + PE banks for just these events
        unc = Uncertainties.from_snr(pool_snr_obs[events])
        lmc_obs = rng.normal(log_mc_det[ev], unc.sigma_log_mc)
        q_obs = rng.normal(q[ev], unc.sigma_q)
        ldl_obs = rng.normal(log_dl[ev], unc.sigma_log_dl)
        snr_obs_ev = pool_snr_obs[events]

        def bank_logw(snr_obs_rows, m1d_b, q_b, dl_b, w_b):
            """Log retarget weights for rows of bank draws.

            Base retarget: Gaussian-law draws → L·p_fid (recorded pdraw stays
            p_fid).  With ``snr_channel`` the rows also absorb the observed-SNR
            likelihood N(snr_obs; A·Θ/dL, √3) with one fresh Θ draw per bank
            sample — conditioning the atoms on the FULL observed data.  The
            campaign precut (z < z_horizon, chirp-distance floor) zeroes the
            mock world's SNR, so it zeroes the factor here too (exact law).
            """
            z_b = planck18_z_of_dl_np(dl_b)
            m1_b = m1d_b / (1.0 + z_b)
            p_fid = default_pop_wt(m1_b, q_b, z_b) * dm1sqz_dm1ddqdl(m1_b, q_b, z_b)
            with np.errstate(divide="ignore"):
                logw = np.log(p_fid) - np.log(w_b)
            if snr_channel:
                theta = draw_projection_factors(rng, m1d_b.shape)
                a_fac = amplitude_factor(m1d_b, m1d_b * q_b)
                mc_det_b = m1d_b * q_b**0.6 / (1.0 + q_b) ** 0.2
                ok = (z_b < Z_HORIZON) & (mc_det_b ** (5.0 / 6.0) / dl_b > CHIRP_DIST_MIN)
                snr_pred = np.where(ok, a_fac * theta / dl_b, 0.0)
                logw = logw - 0.5 * ((snr_obs_rows[..., None] - snr_pred) ** 2) / 3.0
            return logw, p_fid

        m1d_b, q_b, dl_b, w_b = draw_mock_pe_samples(
            lmc_obs[:, None], unc.sigma_log_mc[:, None],
            q_obs[:, None], unc.sigma_q[:, None],
            ldl_obs[:, None], unc.sigma_log_dl[:, None],
            size=(nobs, pe_bank_size), rng=rng,
        )
        logw_all, p_fid_all = bank_logw(snr_obs_ev, m1d_b, q_b, dl_b, w_b)

        def bank_neff(lw):
            mx = np.max(lw)
            if not np.isfinite(mx):
                return None, 0.0
            w = np.exp(lw - mx)
            tot = w.sum()
            return w, tot * tot / np.sum(w * w)

        def gauss3_logpdf(nb, c_mc, s_mc, c_q, s_q, c_dl, s_dl):
            """Unnormalized-constant-free proposal log-density in
            (log Mc, q, log dL).  The q-truncation normalizer and the shared
            -3/2 log 2π are per-event constants — they cancel in the
            resampling weights, so they are omitted."""
            m1d_r, q_r, dl_r = nb[0], nb[1], nb[2]
            lmc_r = np.log(m1d_r * q_r**0.6 / (1.0 + q_r) ** 0.2)
            ldl_r = np.log(dl_r)
            return (
                -0.5 * ((lmc_r - c_mc) / s_mc) ** 2 - np.log(s_mc)
                - 0.5 * ((q_r - c_q) / s_q) ** 2 - np.log(s_q)
                - 0.5 * ((ldl_r - c_dl) / s_dl) ** 2 - np.log(s_dl)
            )

        floor = 2.0 * nsamp
        stacks = [np.empty((nobs, nsamp)) for _ in range(4)]
        for e in range(nobs):
            lw = logw_all[e]
            bank = (m1d_b[e], q_b[e], dl_b[e], p_fid_all[e])
            # Stage 1 — adaptive bank doubling until the retarget Neff clears
            # the reference's ingestion floor (mock_one_year_samples.py:30-44):
            # re-drawing a LARGER bank refines the estimator without changing
            # the generative law (unlike rejecting the event, which would).
            size, attempts = pe_bank_size, 0
            w, neff = bank_neff(lw)
            while neff < floor and attempts < max_bank_doublings:
                attempts += 1
                size *= 2
                nb = draw_mock_pe_samples(
                    lmc_obs[e], unc.sigma_log_mc[e], q_obs[e], unc.sigma_q[e],
                    ldl_obs[e], unc.sigma_log_dl[e], size=(1, size), rng=rng,
                )
                lw2, pf2 = bank_logw(snr_obs_ev[e : e + 1], *nb)
                lw = lw2[0]
                bank = (nb[0][0], nb[1][0], nb[2][0], pf2[0])
                w, neff = bank_neff(lw)
            # Stage 2 — adaptive moment-matched proposal (round-5: the floor
            # is ENFORCED, not warned past).  When the retargeted posterior
            # sits in the far tail of the likelihood-shaped proposal (the
            # round-4 suites logged banks at Neff 14 after 16x doubling),
            # doubling converges ~linearly and stalls.  Instead: fit weighted
            # moments of the current bank in (log Mc, q, log dL), redraw from
            # a recentered proposal widened to cover both the posterior and
            # the displacement, and correct the weights by the exact
            # proposal-density ratio — the estimated law is unchanged (same
            # target, different importance proposal), only its Neff improves.
            adapt = 0
            while neff < floor and adapt < 8:
                adapt += 1
                if w is not None and w.sum() > 0:
                    wn = w / w.sum()
                    lmc_cur = np.log(bank[0] * bank[1] ** 0.6 / (1.0 + bank[1]) ** 0.2)
                    ldl_cur = np.log(bank[2])
                    coords = (lmc_cur, bank[1], ldl_cur)
                    sig0 = (unc.sigma_log_mc[e], unc.sigma_q[e], unc.sigma_log_dl[e])
                    cs = []
                    for x_cur, s0 in zip(coords, sig0):
                        mu = float(np.sum(wn * x_cur))
                        sd = float(np.sqrt(max(np.sum(wn * (x_cur - mu) ** 2), 0.0)))
                        # widen: cover the weighted spread AND the original σ
                        # (a floor against collapse when Neff is tiny)
                        cs.append((mu, max(1.5 * sd, float(s0))))
                    (c_mc, s_mc), (c_q, s_q), (c_dl, s_dl) = cs
                else:  # no finite weight anywhere: widen around the obs
                    infl = 2.0 ** adapt
                    c_mc, s_mc = lmc_obs[e], unc.sigma_log_mc[e] * infl
                    c_q, s_q = q_obs[e], unc.sigma_q[e] * infl
                    c_dl, s_dl = ldl_obs[e], unc.sigma_log_dl[e] * infl
                size = min(size * 2, 1 << 21)
                nb = draw_mock_pe_samples(
                    c_mc, s_mc, c_q, s_q, c_dl, s_dl, size=(1, size), rng=rng
                )
                lw2, pf2 = bank_logw(snr_obs_ev[e : e + 1], *nb)
                nb_flat = (nb[0][0], nb[1][0], nb[2][0], pf2[0])
                # exact proposal correction: + log g0(x) − log g'(x), where
                # g0 is the original likelihood-shaped proposal bank_logw
                # assumes; truncation constants cancel per event
                corr = gauss3_logpdf(
                    nb_flat, lmc_obs[e], unc.sigma_log_mc[e],
                    q_obs[e], unc.sigma_q[e], ldl_obs[e], unc.sigma_log_dl[e],
                ) - gauss3_logpdf(nb_flat, c_mc, s_mc, c_q, s_q, c_dl, s_dl)
                lw_new = lw2[0] + corr
                w_new, neff_new = bank_neff(lw_new)
                if neff_new > neff:
                    lw, bank, w, neff = lw_new, nb_flat, w_new, neff_new
            if w is None:
                print(f"[sbc] WARNING: event {e} bank has no finite weight; uniform fallback")
                w = np.isfinite(bank[3]).astype(float)
            elif neff < floor:
                print(
                    f"[sbc] WARNING: event {e} bank Neff {neff:.0f} < {floor:.0f} "
                    f"after {attempts} doublings + {adapt} adaptive proposals (size {size})"
                )
            pick = rng.choice(len(w), size=nsamp, p=w / w.sum())
            for j in range(4):
                stacks[j][e] = bank[j][pick]

        return make_pop_cosmo_data(
            *stacks, m1d[pool], q[pool], dl[pool], pdraw_det[pool], ndraw=ndraw_eff
        )

    return simulate


def make_pop_sbc_spec_builder(n_grid: int = 128):
    """Spec builder for :func:`run_sbc` over the population-only model."""

    def build(data):
        if data is None:
            # prior-only prototype (no data needed to enumerate priors)
            from bumpcosmology_tpu.inference.likelihoods import POP_PRIORS
            import jax.numpy as jnp

            return ModelSpec(priors=dict(POP_PRIORS), loglike=lambda s: jnp.asarray(0.0))
        return pop_model_spec(data, n_grid=n_grid)

    return build


def make_plpeak_cosmo_sbc_spec_builder(n_grid: int = 128, n_z: int = 256):
    """Spec builder for SBC over the joint POWER-LAW+PEAK model.

    One prior is narrowed relative to the fitting spec: ``mmin`` runs over
    [5, 10] instead of the GWTC-3 [2, 10], because the mock injection
    campaign draws primaries on m1 ≥ 5 (the reference's own grid,
    ``mock_injections.py:145-149``) and the fiducial PE-bank proposal
    inherits that support — a generating θ with mmin < 5 would ask the
    simulator for events it cannot produce.  SBC is exact for whatever
    generating prior the fitted spec shares, so the certificate covers the
    mmin ∈ [5, 10] slice; the fitting spec itself is unchanged.
    """
    from bumpcosmology_tpu.inference.distributions import Uniform
    from bumpcosmology_tpu.inference.likelihoods import (
        PLPEAK_COSMO_PRIORS,
        plpeak_cosmo_loglike,
    )

    priors = {**PLPEAK_COSMO_PRIORS, "mmin": Uniform(5.0, 10.0)}

    def build(data):
        import jax.numpy as jnp

        if data is None:
            return ModelSpec(priors=dict(priors), loglike=lambda s: jnp.asarray(0.0))
        from bumpcosmology_tpu.inference.likelihoods import dl_bounds_of

        bounds = dl_bounds_of(data, margin=0.1)
        return ModelSpec(
            priors=dict(priors),
            loglike=lambda s: plpeak_cosmo_loglike(s, data, n_grid, n_z, bounds),
        )

    return build


def make_brokenpl_cosmo_sbc_spec_builder(n_grid: int = 128, n_z: int = 256):
    """Spec builder for SBC over the joint BROKEN POWER LAW model.

    Same ``mmin`` support slice as the PLPeak builder (campaign draws
    primaries on m1 ≥ 5; see :func:`make_plpeak_cosmo_sbc_spec_builder`).
    """
    from bumpcosmology_tpu.inference.distributions import Uniform
    from bumpcosmology_tpu.inference.likelihoods import (
        BROKENPL_COSMO_PRIORS,
        brokenpl_cosmo_loglike,
    )

    priors = {**BROKENPL_COSMO_PRIORS, "mmin": Uniform(5.0, 10.0)}

    def build(data):
        import jax.numpy as jnp

        if data is None:
            return ModelSpec(priors=dict(priors), loglike=lambda s: jnp.asarray(0.0))
        from bumpcosmology_tpu.inference.likelihoods import dl_bounds_of

        bounds = dl_bounds_of(data, margin=0.1)
        return ModelSpec(
            priors=dict(priors),
            loglike=lambda s: brokenpl_cosmo_loglike(s, data, n_grid, n_z, bounds),
        )

    return build


def make_pop_cosmo_sbc_spec_builder(n_grid: int = 128, n_z: int = 256):
    """Spec builder for :func:`run_sbc` over the joint pop+cosmology model."""

    def build(data):
        if data is None:
            from bumpcosmology_tpu.inference.likelihoods import POP_COSMO_PRIORS
            import jax.numpy as jnp

            return ModelSpec(
                priors=dict(POP_COSMO_PRIORS), loglike=lambda s: jnp.asarray(0.0)
            )
        from bumpcosmology_tpu.inference.likelihoods import pop_cosmo_model_spec

        return pop_cosmo_model_spec(data, n_grid=n_grid, n_z=n_z)

    return build
