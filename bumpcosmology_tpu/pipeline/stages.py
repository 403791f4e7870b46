"""Pipeline stage implementations (L4): the seven reference rules.

Mirrors ``Snakefile:1-125``:
  draw_pe_samples, draw_selection_samples, sample (pop fit), sample_cosmo
  (joint fit), mock_injections, mock_observations, mock_year_samples.

Artifacts are h5py column tables (:mod:`bumpcosmology_tpu.utils.io`) and HDF5
traces (:mod:`bumpcosmology_tpu.utils.trace`).
"""
from __future__ import annotations

import re
from glob import glob
from pathlib import Path

import numpy as np
import pandas as pd

from bumpcosmology_tpu.pipeline.config import PipelineConfig
from bumpcosmology_tpu.pipeline.dag import Pipeline, Stage
from bumpcosmology_tpu.utils.io import read_table, write_table

__all__ = ["build_pipeline", "group_events", "run_pop_fit", "run_pop_cosmo_fit"]


def group_events(df: pd.DataFrame, cols=("m1", "q", "z", "wt")):
    """Stack per-event sample tables to (nobs, nsamp) arrays
    (cf. ``run_fit.py:22-33``).  Requires equal samples per event."""
    out = []
    events = sorted(df["evt"].unique())
    for c in cols:
        out.append(np.stack([df[df.evt == e][c].to_numpy() for e in events]))
    return events, out


# ------------------------------------------------------------------ ingestion


def _stage_fetch(cfg: PipelineConfig):
    """Download the 56 GWTC PE releases + O3 injection file from Zenodo
    (reference: ``showyourwork.yml:27-94``), verifying/resuming as needed.

    Degrades gracefully offline: when nothing usable is present after the
    fetch attempt, either generate rehearsal fixtures
    (``ingest.rehearsal_fallback``, CLI ``--rehearsal``) or stop with an
    actionable message — so ``pipeline all`` goes from an empty data dir to
    figures+report in one command even with Zenodo unreachable."""
    from bumpcosmology_tpu.data.fetch import fetch_inputs

    counts = fetch_inputs(
        cfg.paths.pe_raw_dir,
        cfg.paths.injection_file,
        manifest_out=str(cfg.paths.path("input_manifest.json")),
    )
    print(
        "[fetch] {present} present, {downloaded} downloaded, {failed} failed".format(**counts)
    )
    have_pe = bool(glob(str(Path(cfg.paths.pe_raw_dir) / "*.h5")))
    have_inj = Path(cfg.paths.injection_file).exists()
    if have_pe and have_inj:
        return
    if not cfg.ingest.rehearsal_fallback:
        raise RuntimeError(
            f"fetch left no usable inputs (PE files: {have_pe}, injection "
            f"file: {have_inj}).  Either (a) place the GWTC-2.1/GWTC-3 "
            f"releases under {cfg.paths.pe_raw_dir} and the endo3 injection "
            f"file at {cfg.paths.injection_file} by other means, or (b) rerun "
            "with --rehearsal (config: ingest.rehearsal_fallback=true) to "
            "generate format-faithful rehearsal fixtures and complete the "
            "pipeline offline."
        )
    print(
        "[fetch] no usable inputs and rehearsal fallback enabled — generating "
        f"{cfg.ingest.rehearsal_events} rehearsal events + injection file "
        "(format-faithful mock inputs; see data/rehearsal.py)"
    )
    from bumpcosmology_tpu.data.rehearsal import write_rehearsal_catalog

    n = write_rehearsal_catalog(
        cfg.paths.pe_raw_dir,
        cfg.paths.injection_file,
        n_events=cfg.ingest.rehearsal_events,
        campaign_ndraw=cfg.ingest.rehearsal_campaign_ndraw,
        seed=cfg.ingest.rehearsal_seed,
    )
    print(f"[fetch] rehearsal fallback wrote {n} PE files + injection file")


def _stage_draw_pe_samples(cfg: PipelineConfig):
    from bumpcosmology_tpu.data import RejectedEventError, default_pop_wt, extract_posterior_samples

    rng = np.random.default_rng(cfg.ingest.pe_seed)
    frames = []
    files = sorted(glob(str(Path(cfg.paths.pe_raw_dir) / "*.h5")))
    if not files:
        raise FileNotFoundError(
            f"no GWTC posterior files in {cfg.paths.pe_raw_dir} — run the "
            "'fetch' stage (or place the GWTC-2.1/GWTC-3 releases there "
            "manually; offline, rerun with --rehearsal for format-faithful "
            "fixtures)"
        )
    for f in files:
        m = re.match(r"^.*(GW[0-9_]+[0-9]+).*\.h5$", f)
        name = m[1] if m else Path(f).stem
        try:
            m1, q, z, wt = extract_posterior_samples(
                f, cfg.ingest.nsamp_pe, desired_pop_wt=default_pop_wt, rng=rng
            )
        except (RejectedEventError, ValueError) as err:
            print(f"[draw_pe_samples] skipping {name}: {err}")
            continue
        frames.append(pd.DataFrame({"m1": m1, "q": q, "z": z, "wt": wt, "evt": name}))
    df = pd.concat(frames, ignore_index=True)
    write_table(cfg.paths.path("pe-samples.h5"), df)


def _stage_draw_selection_samples(cfg: PipelineConfig):
    from bumpcosmology_tpu.data import default_pop_wt, extract_selection_samples

    rng = np.random.default_rng(cfg.ingest.sel_seed)
    m1, q, z, pdraw, ndraw = extract_selection_samples(
        cfg.paths.injection_file,
        cfg.ingest.nsamp_sel,
        desired_pop_wt=default_pop_wt,
        far_threshold=cfg.ingest.far_threshold,
        rng=rng,
    )
    df = pd.DataFrame({"m1": m1, "q": q, "z": z, "pdraw": pdraw, "ndraw": ndraw})
    write_table(cfg.paths.path("selection-samples.h5"), df)


# ----------------------------------------------------------------------- fits


def run_pop_fit(cfg: PipelineConfig, pe_table=None, sel_table=None, trace_out=None):
    """Population-only NUTS fit (``run_fit.py``) → trace HDF5."""
    import jax

    from bumpcosmology_tpu.inference.likelihoods import MASS_FAMILIES, make_pop_data
    from bumpcosmology_tpu.inference.nuts import NutsConfig
    from bumpcosmology_tpu.inference.sampler import fit
    from bumpcosmology_tpu.models.population import COORDS
    from bumpcosmology_tpu.utils.trace import Trace, save_trace

    pe = pe_table if pe_table is not None else read_table(cfg.paths.path("pe-samples.h5"))
    sel = sel_table if sel_table is not None else read_table(cfg.paths.path("selection-samples.h5"))

    _, (m1s, qs, zs, wts) = group_events(pe)
    data = make_pop_data(
        m1s, qs, zs, wts,
        sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(), sel["pdraw"].to_numpy(),
        ndraw=float(sel["ndraw"].iloc[0]),
    )
    family = cfg.fit.mass_family
    try:
        fam = MASS_FAMILIES[family]
    except KeyError:
        raise ValueError(
            f"unknown mass_family {family!r} (expected one of {sorted(MASS_FAMILIES)})"
        ) from None
    spec = fam.pop_spec(data, n_grid=cfg.fit.n_grid)
    det_fn = lambda s: fam.pop_det(s, data, n_grid=cfg.fit.n_grid)  # noqa: E731
    nuts_cfg = NutsConfig(
        max_depth=cfg.fit.max_depth,
        target_accept=cfg.fit.target_accept,
        shared_mass=cfg.fit.shared_mass,
    )
    res = fit(
        spec,
        jax.random.PRNGKey(cfg.fit.seed),
        num_warmup=cfg.fit.num_warmup,
        num_samples=cfg.fit.num_samples,
        num_chains=cfg.fit.num_chains,
        cfg=nuts_cfg,
        sampler=cfg.fit.sampler,
        deterministics_fn=det_fn,
    )
    trace = Trace(
        res.posterior, res.sample_stats, coords=COORDS,
        attrs={"model": "pop", "family": family},
    )
    save_trace(trace_out or cfg.paths.path(fam.trace_name), trace)
    return res


def run_pop_cosmo_fit(cfg: PipelineConfig, pe_table=None, sel_table=None, trace_out=None):
    """Joint population+cosmology NUTS fit (``run_cosmo_fit.py``) → trace HDF5.

    Converts source-frame artifacts to detector frame on the host:
    m1_det = m1 (1+z), dL = Planck18 dL(z), pdraw_cosmo = wt · Jacobian
    (``run_cosmo_fit.py:22-30``).
    """
    import jax

    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
    from bumpcosmology_tpu.inference.likelihoods import (
        MASS_FAMILIES,
        make_pop_cosmo_data,
    )
    from bumpcosmology_tpu.inference.nuts import NutsConfig
    from bumpcosmology_tpu.inference.sampler import fit
    from bumpcosmology_tpu.models.population import COORDS
    from bumpcosmology_tpu.utils.trace import Trace, save_trace

    pe = pe_table if pe_table is not None else read_table(cfg.paths.path("pe-samples.h5"))
    sel = sel_table if sel_table is not None else read_table(cfg.paths.path("selection-samples.h5"))

    for df, wt_col in ((pe, "wt"), (sel, "pdraw")):
        df["m1d"] = df["m1"] * (1.0 + df["z"])
        df["dl"] = planck18_dl_np(df["z"].to_numpy())
        df["pdraw_cosmo"] = df[wt_col] * dm1sqz_dm1ddqdl(
            df["m1"].to_numpy(), df["q"].to_numpy(), df["z"].to_numpy()
        )

    _, (m1d, qs, dls, pdraws) = group_events(pe, cols=("m1d", "q", "dl", "pdraw_cosmo"))
    data = make_pop_cosmo_data(
        m1d, qs, dls, pdraws,
        sel["m1d"].to_numpy(), sel["q"].to_numpy(), sel["dl"].to_numpy(),
        sel["pdraw_cosmo"].to_numpy(),
        ndraw=float(sel["ndraw"].iloc[0]),
    )
    family = cfg.fit.mass_family
    try:
        fam = MASS_FAMILIES[family]
    except KeyError:
        raise ValueError(
            f"unknown mass_family {family!r} (expected one of {sorted(MASS_FAMILIES)})"
        ) from None
    spec = fam.cosmo_spec(data, n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z)
    det_fn = lambda s: fam.cosmo_det(  # noqa: E731
        s, data, n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z
    )
    nuts_cfg = NutsConfig(
        max_depth=cfg.fit.max_depth,
        target_accept=cfg.fit.target_accept,
        shared_mass=cfg.fit.shared_mass,
    )
    res = fit(
        spec,
        jax.random.PRNGKey(cfg.fit.cosmo_seed),
        num_warmup=cfg.fit.num_warmup,
        num_samples=cfg.fit.num_samples,
        num_chains=cfg.fit.num_chains,
        cfg=nuts_cfg,
        sampler=cfg.fit.sampler,
        deterministics_fn=det_fn,
    )
    trace = Trace(
        res.posterior, res.sample_stats, coords=COORDS,
        attrs={"model": "pop_cosmo", "family": family},
    )
    save_trace(trace_out or cfg.paths.path(fam.cosmo_trace_name), trace)
    return res


# ----------------------------------------------------------------------- mock


def _load_psds(psd_files):
    """{det: path} of tabulated (f, S_n) curves -> {det: psd callable}."""
    if not psd_files:
        return None
    from bumpcosmology_tpu.mock.psd import tabulated_psd

    psds = {}
    for det, path in psd_files.items():
        if str(path).endswith(".npz"):
            with np.load(path) as d:
                f, v = np.asarray(d["f"]), np.asarray(d["psd"])
        else:
            arr = np.loadtxt(path, delimiter="," if str(path).endswith(".csv") else None)
            f, v = arr[:, 0], arr[:, 1]
        psds[det] = tabulated_psd(f, v)
    return psds


def _stage_mock_injections(cfg: PipelineConfig):
    from bumpcosmology_tpu.mock import campaign_summary, draw_injection_campaign

    inj = draw_injection_campaign(
        ndraw=cfg.mock.ndraw,
        seed=cfg.mock.injection_seed,
        z_horizon=cfg.mock.z_horizon,
        chirp_dist_min=cfg.mock.chirp_dist_min,
        snr_chunk=cfg.mock.snr_chunk,
        psds=_load_psds(cfg.mock.psd_files),
    )
    write_table(cfg.paths.path("mock_injections.h5"), inj, key="true_parameters")
    stats = campaign_summary(inj, threshold=cfg.mock.detection_snr)
    print(
        "[mock_injections] {n_detected} detected (SNR>{thr}); "
        "{predicted_detections_per_year:.0f} det/yr predicted; "
        "Neff(default pop) = {neff_default_pop:.1f}; "
        "expected pop-model draws = {expected_pop_draws:.1f}".format(
            thr=cfg.mock.detection_snr, **stats
        )
    )


def _stage_mock_observations(cfg: PipelineConfig):
    from bumpcosmology_tpu.mock import add_observation_noise

    inj = read_table(cfg.paths.path("mock_injections.h5"), key="true_parameters")
    obs = add_observation_noise(
        inj, seed=cfg.mock.observation_seed, threshold=cfg.mock.detection_snr
    )
    write_table(cfg.paths.path("mock_observations.h5"), obs, key="observations")


def _stage_mock_year_samples(cfg: PipelineConfig):
    from bumpcosmology_tpu.mock import draw_one_year_catalog

    inj = read_table(cfg.paths.path("mock_injections.h5"), key="true_parameters")
    obs = read_table(cfg.paths.path("mock_observations.h5"), key="observations")
    cat = draw_one_year_catalog(len(inj), obs, nsamp=cfg.mock.nsamp, seed=cfg.mock.catalog_seed)
    write_table(cfg.paths.path("mock_year_samples.h5"), cat)


def _stage_mock_fit_inputs(cfg: PipelineConfig):
    """Convert mock-universe artifacts into fit inputs (pe-samples.h5 +
    selection-samples.h5), closing the fully synthetic loop:

        mock_injections -> mock_observations -> mock_year_samples
                        -> mock_fit_inputs -> sample / sample_cosmo

    The reference never wires its mock branch into the fits (SURVEY.md §4 —
    the mock catalog was only eyeballed); here it is a first-class path, and
    the selection set uses the same noisy detection criterion as the catalog
    (an independent noise realization estimates the over-noise detection
    probability).
    """
    import numpy as np

    from bumpcosmology_tpu.mock import add_observation_noise

    rng = np.random.default_rng(cfg.ingest.sel_seed)
    inj = read_table(cfg.paths.path("mock_injections.h5"), key="true_parameters")
    cat = read_table(cfg.paths.path("mock_year_samples.h5"))
    write_table(cfg.paths.path("pe-samples.h5"), cat)

    det = add_observation_noise(inj, seed=cfg.mock.observation_seed + 1,
                                threshold=cfg.mock.detection_snr)
    nsel = min(cfg.ingest.nsamp_sel, len(det))
    pick = rng.choice(len(det), size=nsel, replace=False)
    sel = det.iloc[pick]
    ndraw = float(len(inj)) * (nsel / len(det))
    df = pd.DataFrame(
        {
            "m1": sel["m1"].to_numpy(),
            "q": sel["q"].to_numpy(),
            "z": sel["z"].to_numpy(),
            "pdraw": sel["pdraw_mqz"].to_numpy(),
            "ndraw": ndraw,
        }
    )
    write_table(cfg.paths.path("selection-samples.h5"), df)
    print(f"[mock_fit_inputs] {cat['evt'].nunique()} events, {nsel} selection samples")


def _stage_sbc(cfg: PipelineConfig):
    """Simulation-based calibration suite -> sbc_ranks.h5 (ranks + p-values).

    The reference has no calibration machinery; this is the scale-out config
    of BASELINE.md ("multi-chain calibration suite").
    """
    import h5py
    import jax

    from bumpcosmology_tpu.inference.calibration import (
        make_mock_pop_cosmo_simulator,
        make_mock_pop_simulator,
        make_pop_cosmo_sbc_spec_builder,
        make_pop_sbc_spec_builder,
        run_sbc_fleet,
        sbc_uniformity_pvalues,
    )
    from bumpcosmology_tpu.mock import add_observation_noise, draw_injection_campaign

    c = cfg.sbc
    inj = draw_injection_campaign(ndraw=c.campaign_ndraw, seed=c.seed, snr_chunk=cfg.mock.snr_chunk)
    obs = add_observation_noise(inj, seed=c.seed + 1, threshold=c.threshold)
    n_total = float(len(inj))
    if c.pool_max and len(obs) > c.pool_max:
        # uniform thinning of the detected pool; Ndraw scales by the kept
        # fraction so the selection estimator stays unbiased
        frac = c.pool_max / len(obs)
        rng_pool = np.random.default_rng(c.seed + 5)
        keep = rng_pool.choice(len(obs), size=c.pool_max, replace=False)
        obs = obs.iloc[keep].reset_index(drop=True)
        n_total = n_total * frac
        print(f"[sbc] detected pool thinned to {len(obs)} (Ndraw_eff {n_total:.0f})")
    if c.model in ("pop_cosmo", "plpeak_cosmo", "brokenpl_cosmo"):
        from bumpcosmology_tpu.inference.calibration import (
            make_brokenpl_cosmo_sbc_spec_builder,
            make_mock_pop_cosmo_simulator_fresh,
            make_plpeak_cosmo_sbc_spec_builder,
        )
        from bumpcosmology_tpu.inference.likelihoods import (
            brokenpl_cosmo_loglike,
            dl_bounds_of,
            plpeak_cosmo_loglike,
            pop_cosmo_loglike,
        )

        family = {"pop_cosmo": "bump", "plpeak_cosmo": "plpeak",
                  "brokenpl_cosmo": "brokenpl"}[c.model]
        # the joint model needs a larger selection set or its SBC ranks are
        # corrupted by selection-MC pseudo-modes (docs/DESIGN.md §5a)
        if c.fresh_noise:
            if c.pool_max:
                # the fresh-noise simulator redraws its detected pool per
                # simulation from the full campaign; the shared-pool cap does
                # not apply (its per-sim pool size is nsel)
                print("[sbc] note: pool_max only applies to the shared-bank simulators")
            simulate = make_mock_pop_cosmo_simulator_fresh(
                inj, nobs=c.nobs, nsamp=c.nsamp, nsel=max(c.nsel, 2048),
                pe_bank_size=c.pe_bank_size, threshold=c.threshold, family=family,
            )
        else:
            if family != "bump":
                raise ValueError(f"{c.model} SBC requires fresh_noise=True")
            simulate = make_mock_pop_cosmo_simulator(
                obs, n_total_injections=n_total, nobs=c.nobs, nsamp=c.nsamp,
                nsel=max(c.nsel, 2048), pe_bank_size=c.pe_bank_size, seed=c.seed + 2,
            )
        if family == "plpeak":
            builder = make_plpeak_cosmo_sbc_spec_builder(n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z)
            loglike_fn = plpeak_cosmo_loglike
        elif family == "brokenpl":
            builder = make_brokenpl_cosmo_sbc_spec_builder(
                n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z
            )
            loglike_fn = brokenpl_cosmo_loglike
        else:
            builder = make_pop_cosmo_sbc_spec_builder(n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z)
            loglike_fn = pop_cosmo_loglike
        proto = builder(None)

        def make_loglike(datas):
            bounds = dl_bounds_of(datas, margin=0.1)
            return lambda sites, d: loglike_fn(
                sites, d, cfg.fit.n_grid, cfg.fit.n_z, bounds
            )

    elif c.model == "pop":
        from bumpcosmology_tpu.inference.likelihoods import pop_loglike

        simulate = make_mock_pop_simulator(
            obs, n_total_injections=n_total, nobs=c.nobs, nsamp=c.nsamp, nsel=c.nsel,
            seed=c.seed + 2,
        )
        proto = make_pop_sbc_spec_builder(n_grid=cfg.fit.n_grid)(None)

        def make_loglike(datas):
            return lambda sites, d: pop_loglike(sites, d, cfg.fit.n_grid)

    else:
        raise ValueError(
            f"unknown sbc model {c.model!r}; use 'pop', 'pop_cosmo', "
            "'plpeak_cosmo' or 'brokenpl_cosmo'"
        )
    from bumpcosmology_tpu.inference.nuts import NutsConfig

    ranks = run_sbc_fleet(
        proto,
        make_loglike,
        simulate,
        n_sims=c.n_sims,
        key=jax.random.PRNGKey(c.seed + 3),
        num_warmup=c.num_warmup,
        num_samples=c.num_samples,
        thin=c.thin,
        cfg=NutsConfig(max_depth=c.max_depth),
        chunk_size=c.fleet_chunk,
    )
    pvals = sbc_uniformity_pvalues(ranks)

    # rate-reconstruction calibration (round-5): R is not a fitted site, so
    # the fleet gives it no rank; check the post-hoc reconstruction path's
    # frequentist coverage at catalog scale with this suite's own family +
    # campaign driving the mu(theta) mixing (docstring of
    # rate_reconstruction_ranks for the statistics)
    rate_ranks, rate_p = None, None
    if c.model in ("pop_cosmo", "plpeak_cosmo", "brokenpl_cosmo"):
        try:
            from scipy.stats import kstest

            from bumpcosmology_tpu.inference.calibration import (
                rate_reconstruction_ranks,
                selection_mu_samples,
            )

            fam = {"pop_cosmo": "bump", "plpeak_cosmo": "plpeak",
                   "brokenpl_cosmo": "brokenpl"}[c.model]
            mu = selection_mu_samples(
                inj, fam, max(512, 4 * c.n_sims), jax.random.PRNGKey(c.seed + 9),
                threshold=c.threshold,
            )
            rate_ranks = rate_reconstruction_ranks(
                mu, r_true=2.3, rng=np.random.default_rng(c.seed + 10)
            )
            rate_p = float(kstest(rate_ranks, "uniform").pvalue)
            print(f"[sbc] rate-reconstruction rank uniformity: p={rate_p:.3f} "
                  f"({len(rate_ranks)} trials)")
        except Exception as err:  # the fleet certificate must not die on this
            print(f"[sbc] WARNING: rate-reconstruction check failed: {err!r}")

    bad = write_sbc_artifact(
        cfg.paths.path("sbc_ranks.h5"), c.model, c.n_sims, ranks, pvals,
        rate_ranks=rate_ranks, rate_p=rate_p,
    )
    print("[sbc] uniformity p-values:", {k: round(v, 3) for k, v in pvals.items()})
    if bad:
        print(f"[sbc] WARNING: sites failing uniformity at p<0.01: {bad}")
    else:
        print(f"[sbc] all {len(pvals)} sites pass uniformity at p>=0.01")


def write_sbc_artifact(
    out, model: str, n_sims: int, ranks: dict, pvals: dict,
    rate_ranks=None, rate_p=None,
) -> list:
    """Persist SBC ranks + per-site verdicts; returns the failing sites.

    Pass/fail is stored as first-class datasets (``pvalues/site``,
    ``pvalues/p``, ``pvalues/passed`` in matching order, plus the ``all_pass``
    root attr), so the artifact carries its own calibration verdict rather
    than burying p-values in HDF5 attrs.  Per-site attrs on ``pvalues`` are
    kept for readers of the older layout (``figures/plots.py:236``).
    """
    import h5py

    bad = sorted(k for k, v in pvals.items() if v < 0.01)
    with h5py.File(out, "w") as f:
        f.attrs["model"] = model
        f.attrs["n_sims"] = n_sims
        f.attrs["all_pass"] = not bad
        g = f.create_group("ranks")
        for k, v in ranks.items():
            g.create_dataset(k.strip("_") if k == "__n_bins__" else k, data=np.asarray(v))
        sites = sorted(pvals)
        g2 = f.create_group("pvalues")
        g2.create_dataset("site", data=np.array(sites, dtype="S32"))
        g2.create_dataset("p", data=np.array([pvals[s] for s in sites]))
        g2.create_dataset("passed", data=np.array([pvals[s] >= 0.01 for s in sites]))
        for k, v in pvals.items():
            g2.attrs[k] = v
        if rate_ranks is not None:
            g3 = f.create_group("rate_check")
            g3.create_dataset("ranks", data=np.asarray(rate_ranks))
            g3.attrs["p"] = float(rate_p)
            g3.attrs["passed"] = bool(rate_p >= 0.01)
            g3.attrs["method"] = (
                "frequentist rank coverage of the Gaussian R reconstruction "
                "(R = nobs/mu + sqrt(nobs)/mu * R_unit) with nobs ~ "
                "Poisson(2.3 * mu(theta)), mu from prior draws on this "
                "suite's campaign; see inference/calibration.py"
            )
    return bad


def _score_check_sites0(model: str) -> dict:
    """Default ("true") parameter sites for the score-identity check."""
    from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION, PLANCK18

    sites = {"h": PLANCK18.h, "Om": PLANCK18.Om, "w": PLANCK18.w, "R_unit": 0.0}
    if model == "plpeak_cosmo":
        from bumpcosmology_tpu.models.plpeak import DEFAULT_PLPEAK_POPULATION

        mp = DEFAULT_PLPEAK_POPULATION.mass
        rp = DEFAULT_PLPEAK_POPULATION.redshift
        sites.update(
            alpha=mp.alpha, beta_q=mp.beta_q, mmin=mp.mmin, mmax=mp.mmax,
            lam_peak=mp.lam_peak, mu_m=mp.mu_m, sigma_m=mp.sigma_m,
            delta_m=mp.delta_m,
        )
    elif model == "brokenpl_cosmo":
        from bumpcosmology_tpu.models.brokenpl import DEFAULT_BROKENPL_POPULATION

        mp = DEFAULT_BROKENPL_POPULATION.mass
        # the campaign draws primaries on m1 >= 5, so the score-check truth
        # uses mmin=5 (same support slice as the SBC spec builders)
        sites.update(
            alpha1=mp.alpha1, alpha2=mp.alpha2, bfrac=mp.bfrac, beta_q=mp.beta_q,
            mmin=max(float(mp.mmin), 5.0), mmax=mp.mmax, delta_m=mp.delta_m,
        )
    else:
        mp = DEFAULT_POPULATION.mass
        sites.update(
            a=mp.a, b=mp.b, c=mp.c, mpisn=mp.mpisn, dmbhmax=mp.mbhmax - mp.mpisn,
            sigma=mp.sigma, log_fpl=float(np.log(mp.fpl)), beta=mp.beta,
        )
    rp = DEFAULT_POPULATION.redshift
    sites.update(lam=rp.lam, dkappa=rp.kappa - rp.lam, zp=rp.zp)
    return sites


def _stage_score_check(cfg: PipelineConfig):
    """Score-identity diagnostic → ``score_check.h5`` (fit-free mismatch test).

    E_{data|θ₀}[∇ log L̂(θ₀)] per hyperparameter and likelihood term over
    fresh simulated catalogs (docs/DESIGN.md §9.5 — the instrument that
    found the λ root cause).  Pass = every TOTAL |z| under ``score.z_bar``.
    """
    import h5py
    import jax  # noqa: F401  (device availability drives interp defaults upstream)

    from bumpcosmology_tpu.inference.calibration import (
        make_mock_pop_cosmo_simulator_fresh,
    )
    from bumpcosmology_tpu.inference.score_check import (
        joint_term_grads,
        score_identity_check,
    )
    from bumpcosmology_tpu.mock import draw_injection_campaign

    c = cfg.score
    if c.model not in ("pop_cosmo", "plpeak_cosmo", "brokenpl_cosmo"):
        raise ValueError(
            f"unknown score_check model {c.model!r}; use 'pop_cosmo', "
            "'plpeak_cosmo' or 'brokenpl_cosmo'"
        )
    family = {"pop_cosmo": "bump", "plpeak_cosmo": "plpeak",
              "brokenpl_cosmo": "brokenpl"}[c.model]
    from bumpcosmology_tpu.inference.likelihoods import MASS_FAMILIES

    build = MASS_FAMILIES[family].build

    inj = draw_injection_campaign(
        ndraw=c.campaign_ndraw, seed=c.seed, snr_chunk=cfg.mock.snr_chunk
    )
    simulate = make_mock_pop_cosmo_simulator_fresh(
        inj, nobs=c.nobs, nsamp=c.nsamp, nsel=c.nsel,
        pe_bank_size=c.pe_bank_size, threshold=c.threshold, family=family,
    )
    sites0 = _score_check_sites0(c.model)
    grad_sites = tuple(k for k in sites0 if k != "R_unit")
    term_grads = joint_term_grads(
        sites0, grad_sites, nobs=c.nobs, n_grid=c.n_grid, n_z=c.n_z, build=build
    )

    def progress(i, n):
        if i % 50 == 0 or i == n:
            print(f"[score_check] {i}/{n} catalogs", flush=True)

    res = score_identity_check(
        simulate, sites0, term_grads, grad_sites,
        n_catalogs=c.n_catalogs, seed=c.seed + 1, progress=progress,
    )
    print(res.table())
    ok = res.max_abs_z() < c.z_bar
    out = cfg.paths.path("score_check.h5")
    with h5py.File(out, "w") as f:
        f.attrs["model"] = c.model
        f.attrs["n_catalogs"] = res.n_catalogs
        f.attrs["z_bar"] = c.z_bar
        f.attrs["all_pass"] = ok
        f.create_dataset("site", data=np.array(res.sites, dtype="S32"))
        f.create_dataset("mean", data=res.mean)
        f.create_dataset("se", data=res.se)
        f.create_dataset("z", data=res.z)
    verdict = "PASS" if ok else "FAIL"
    print(f"[score_check] max TOTAL |z| = {res.max_abs_z():.2f} (bar {c.z_bar}) -> {verdict}")
    if not ok:
        print(
            "[score_check] WARNING: nonzero expected score — the simulator and "
            "the fitted likelihood disagree; see the per-term table above"
        )


def _stage_loo(cfg: PipelineConfig):
    """Leave-one-out event-influence diagnostics → ``influence.h5``.

    Refits the catalog nobs times, each with one event removed, as a single
    lockstep fleet (:mod:`bumpcosmology_tpu.inference.influence`), and scores
    each event's influence on every scalar site against the full-catalog
    trace in posterior-sd units.  A per-event capability the reference does
    not have (its closure-based model would recompile per refit).
    """
    import jax

    from bumpcosmology_tpu.inference.influence import influence_summary, loo_fit
    from bumpcosmology_tpu.inference.nuts import NutsConfig
    from bumpcosmology_tpu.utils.trace import load_trace

    c = cfg.loo
    pe = read_table(cfg.paths.path("pe-samples.h5"))
    sel = read_table(cfg.paths.path("selection-samples.h5"))

    if c.model == "pop_cosmo":
        from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
        from bumpcosmology_tpu.inference.likelihoods import (
            dl_bounds_of,
            make_pop_cosmo_data,
            pop_cosmo_loglike,
            pop_cosmo_model_spec,
        )

        for df, wt_col in ((pe, "wt"), (sel, "pdraw")):
            df["m1d"] = df["m1"] * (1.0 + df["z"])
            df["dl"] = planck18_dl_np(df["z"].to_numpy())
            df["pdraw_cosmo"] = df[wt_col] * dm1sqz_dm1ddqdl(
                df["m1"].to_numpy(), df["q"].to_numpy(), df["z"].to_numpy()
            )
        names, (m1d, qs, dls, pdraws) = group_events(pe, cols=("m1d", "q", "dl", "pdraw_cosmo"))
        data = make_pop_cosmo_data(
            m1d, qs, dls, pdraws,
            sel["m1d"].to_numpy(), sel["q"].to_numpy(), sel["dl"].to_numpy(),
            sel["pdraw_cosmo"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
        )
        spec = pop_cosmo_model_spec(data, n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z)
        bounds = dl_bounds_of(data, margin=0.1)
        loglike = lambda s, d: pop_cosmo_loglike(s, d, cfg.fit.n_grid, cfg.fit.n_z, bounds)
        trace_path = cfg.paths.path("trace_cosmo.h5")
    else:
        from bumpcosmology_tpu.inference.likelihoods import (
            make_pop_data,
            pop_loglike,
            pop_model_spec,
        )

        names, (m1s, qs, zs, wts) = group_events(pe)
        data = make_pop_data(
            m1s, qs, zs, wts,
            sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
            sel["pdraw"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
        )
        spec = pop_model_spec(data, n_grid=cfg.fit.n_grid)
        loglike = lambda s, d: pop_loglike(s, d, cfg.fit.n_grid)
        trace_path = cfg.paths.path("trace.h5")

    loo = loo_fit(
        spec, loglike, data, jax.random.PRNGKey(c.seed),
        num_warmup=c.num_warmup, num_samples=c.num_samples,
        cfg=NutsConfig(max_depth=c.max_depth), chunk_size=c.fleet_chunk,
    )
    full = load_trace(trace_path).posterior
    infl = influence_summary(loo, full)
    out = cfg.paths.path("influence.h5")
    write_influence_artifact(out, c.model, names, infl)
    worst = max(
        ((site, i, float(v["z"][i])) for site, v in infl.items() for i in range(len(v["z"]))),
        key=lambda t: abs(t[2]),
        default=None,
    )
    if worst is not None:
        print(
            f"[loo] most influential: event {names[worst[1]]} on site {worst[0]} "
            f"(z = {worst[2]:+.2f} posterior sds); artifact {out}"
        )


def _stage_compare(cfg: PipelineConfig):
    """Predictive model comparison: pop vs pop_cosmo → ``model_compare.h5``.

    PSIS-LOO + WAIC over the per-event likelihood decomposition of both
    saved traces on the SAME catalog (the reference fits both models,
    ``run_fit.py``/``run_cosmo_fit.py``, but never compares them).  The
    per-event Pareto k̂ also flags influential events — the cheap,
    refit-free complement to ``pipeline loo``.
    """
    import h5py

    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
    from bumpcosmology_tpu.inference.likelihoods import (
        dl_bounds_of,
        make_pop_cosmo_data,
        make_pop_data,
        pop_cosmo_model_spec,
        pop_model_spec,
    )
    from bumpcosmology_tpu.inference.model_compare import (
        compare,
        pointwise_matrix,
        pop_cosmo_pointwise_loglike,
        pop_pointwise_loglike,
        psis_loo,
        waic,
    )
    from bumpcosmology_tpu.utils.trace import load_trace

    c = cfg.compare
    pe = read_table(cfg.paths.path("pe-samples.h5"))
    sel = read_table(cfg.paths.path("selection-samples.h5"))

    # --- pop (source frame, fixed Planck18) ---
    names, (m1s, qs, zs, wts) = group_events(pe)
    pop_data = make_pop_data(
        m1s, qs, zs, wts,
        sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
        sel["pdraw"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
    )
    pop_spec = pop_model_spec(pop_data, n_grid=cfg.fit.n_grid)
    pop_post = load_trace(cfg.paths.path("trace.h5")).posterior
    ll_pop = pointwise_matrix(
        lambda s: pop_pointwise_loglike(s, pop_data, cfg.fit.n_grid),
        pop_post, list(pop_spec.priors), max_draws=c.max_draws, batch=c.batch,
    )
    specs = {"pop": pop_spec}
    posts = {"pop": pop_post}

    # --- pop_cosmo (detector frame; same conversion as run_pop_cosmo_fit) ---
    for df, wt_col in ((pe, "wt"), (sel, "pdraw")):
        df["m1d"] = df["m1"] * (1.0 + df["z"])
        df["dl"] = planck18_dl_np(df["z"].to_numpy())
        df["pdraw_cosmo"] = df[wt_col] * dm1sqz_dm1ddqdl(
            df["m1"].to_numpy(), df["q"].to_numpy(), df["z"].to_numpy()
        )
    names2, (m1d, qs2, dls, pdraws) = group_events(pe, cols=("m1d", "q", "dl", "pdraw_cosmo"))
    assert names2 == names
    cosmo_data = make_pop_cosmo_data(
        m1d, qs2, dls, pdraws,
        sel["m1d"].to_numpy(), sel["q"].to_numpy(), sel["dl"].to_numpy(),
        sel["pdraw_cosmo"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
    )
    cosmo_spec = pop_cosmo_model_spec(cosmo_data, n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z)
    bounds = dl_bounds_of(cosmo_data, margin=0.1)
    cosmo_post = load_trace(cfg.paths.path("trace_cosmo.h5")).posterior
    ll_cosmo = pointwise_matrix(
        lambda s: pop_cosmo_pointwise_loglike(
            s, cosmo_data, cfg.fit.n_grid, cfg.fit.n_z, bounds
        ),
        cosmo_post, list(cosmo_spec.priors), max_draws=c.max_draws, batch=c.batch,
    )
    specs["pop_cosmo"] = cosmo_spec
    posts["pop_cosmo"] = cosmo_post

    matrices = {"pop": ll_pop, "pop_cosmo": ll_cosmo}

    # Optional other-family traces on the same catalog (run_pop_fit /
    # run_pop_cosmo_fit with mass_family="plpeak"/"brokenpl"): include them
    # in the ranking when present, so the physical bump model is compared
    # against the phenomenological LVK fiducials head-to-head.
    from bumpcosmology_tpu.inference.likelihoods import MASS_FAMILIES

    for famname, fam in MASS_FAMILIES.items():
        if famname == "bump":
            continue
        candidates = (
            (
                f"pop_{famname}",
                fam.trace_name,
                lambda s, b=fam.build: pop_pointwise_loglike(
                    s, pop_data, cfg.fit.n_grid, build=b
                ),
                fam.pop_priors,
                lambda: fam.pop_spec(pop_data, n_grid=cfg.fit.n_grid),
            ),
            (
                f"pop_cosmo_{famname}",
                fam.cosmo_trace_name,
                lambda s, b=fam.build: pop_cosmo_pointwise_loglike(
                    s, cosmo_data, cfg.fit.n_grid, cfg.fit.n_z, bounds, build=b
                ),
                fam.cosmo_priors,
                lambda: fam.cosmo_spec(cosmo_data, n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z),
            ),
        )
        for name, fname, fn, priors, make_spec in candidates:
            path = cfg.paths.path(fname)
            if Path(path).exists():
                post = load_trace(path).posterior
                matrices[name] = pointwise_matrix(
                    fn, post, list(priors), max_draws=c.max_draws, batch=c.batch
                )
                posts[name] = post
                specs[name] = make_spec()

    loos = {k: psis_loo(v) for k, v in matrices.items()}
    waics = {k: waic(v) for k, v in matrices.items()}
    table = compare(loos)
    print("[compare]\n" + table)
    for name, r in loos.items():
        bad = [(names[i], float(r.khat[i])) for i in np.nonzero(r.khat > 0.7)[0]]
        if bad:
            print(f"[compare] {name}: Pareto k̂ > 0.7 (PSIS unreliable) for {bad}")

    # Fully Bayesian complement to the predictive ranking: bridge-sampling
    # marginal likelihoods → log10 Bayes factors (the event marginals are
    # frame-invariant — pdraw carries the Jacobian — so log Z is comparable
    # across the source-frame and detector-frame models).
    from bumpcosmology_tpu.inference.evidence import (
        bayes_factor_table,
        log_evidence_bridge,
    )

    evidences = {}
    for name, spec in specs.items():
        try:
            evidences[name] = log_evidence_bridge(
                spec, posts[name], max_draws=c.max_draws, batch=c.batch
            )
        except (FloatingPointError, ValueError, np.linalg.LinAlgError) as exc:
            # LinAlgError: NaN draws in a trace make the proposal covariance
            # non-Cholesky-able; degrade to "no evidence for this model"
            # rather than aborting the stage after LOO/WAIC already ran.
            print(f"[compare] evidence for {name} failed: {exc}")
    bf_table = bayes_factor_table(evidences) if evidences else ""
    if bf_table:
        print("[compare] marginal likelihoods (bridge sampling)\n" + bf_table)

    out = cfg.paths.path("model_compare.h5")
    with h5py.File(out, "w") as f:
        f.attrs["table"] = table
        f.attrs["bf_table"] = bf_table
        f.attrs["best_model"] = max(loos, key=lambda k: loos[k].elpd)
        f.create_dataset("event", data=np.array([str(n) for n in names], dtype="S64"))
        for name in matrices:
            g = f.create_group(name)
            r, w = loos[name], waics[name]
            g.create_dataset("elpd_i", data=r.elpd_i)
            g.create_dataset("khat", data=r.khat)
            g.create_dataset("pointwise", data=matrices[name])
            g.attrs.update(
                elpd=r.elpd, se=r.se, p_loo=r.p_loo,
                waic_elpd=w.elpd, waic_se=w.se, p_waic=w.p_waic,
                n_draws=matrices[name].shape[0],
            )
            if name in evidences:
                e = evidences[name]
                g.attrs.update(log_z=e.log_z, log_z_se=e.se)
                g.create_dataset("log_z_blocks", data=e.log_z_blocks)
    return table


def _stage_ppc(cfg: PipelineConfig):
    """Posterior predictive checks: observed catalog vs the injection-
    reweighted detected population predicted by each saved trace →
    ``ppc.h5`` (beyond parity: the reference never checks its fit against
    the catalog it fitted).

    Runs for every trace present — pop, pop_cosmo, and their PLPeak-family
    variants — and reports a per-observable posterior-predictive p-value
    (KS vs weighted predicted CDF, replication-calibrated;
    ``inference/ppc.py``).
    """
    import h5py

    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
    from bumpcosmology_tpu.inference.likelihoods import (
        MASS_FAMILIES,
        make_pop_cosmo_data,
        make_pop_data,
    )
    from bumpcosmology_tpu.inference.ppc import posterior_predictive_check
    from bumpcosmology_tpu.utils.trace import load_trace

    c = cfg.ppc
    pe = read_table(cfg.paths.path("pe-samples.h5"))
    sel = read_table(cfg.paths.path("selection-samples.h5"))

    names, (m1s, qs, zs, wts) = group_events(pe)
    pop_data = make_pop_data(
        m1s, qs, zs, wts,
        sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
        sel["pdraw"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
    )
    for df, wt_col in ((pe, "wt"), (sel, "pdraw")):
        df["m1d"] = df["m1"] * (1.0 + df["z"])
        df["dl"] = planck18_dl_np(df["z"].to_numpy())
        df["pdraw_cosmo"] = df[wt_col] * dm1sqz_dm1ddqdl(
            df["m1"].to_numpy(), df["q"].to_numpy(), df["z"].to_numpy()
        )
    _, (m1d, qs2, dls, pdraws) = group_events(pe, cols=("m1d", "q", "dl", "pdraw_cosmo"))
    cosmo_data = make_pop_cosmo_data(
        m1d, qs2, dls, pdraws,
        sel["m1d"].to_numpy(), sel["q"].to_numpy(), sel["dl"].to_numpy(),
        sel["pdraw_cosmo"].to_numpy(), ndraw=float(sel["ndraw"].iloc[0]),
    )

    candidates = []
    for famname, fam in MASS_FAMILIES.items():
        suffix = "" if famname == "bump" else f"_{famname}"
        candidates.append(
            (f"pop{suffix}", fam.trace_name, pop_data, fam.build, fam.pop_priors)
        )
        candidates.append(
            (f"pop_cosmo{suffix}", fam.cosmo_trace_name, cosmo_data, fam.build,
             fam.cosmo_priors)
        )
    out = cfg.paths.path("ppc.h5")
    n_done = 0
    with h5py.File(out, "w") as f:
        f.attrs["n_draws"] = c.n_draws
        for name, fname, data, build, priors in candidates:
            path = cfg.paths.path(fname)
            if not Path(path).exists():
                continue
            post = load_trace(path).posterior
            res = posterior_predictive_check(
                post, list(priors), data, build=build,
                n_grid=cfg.fit.n_grid, n_z=cfg.fit.n_z,
                n_draws=c.n_draws, seed=c.seed, batch=c.batch,
                model="pop_cosmo" if "cosmo" in name else "pop",
            )
            g = f.create_group(name)
            g.attrs["n_draws"] = res.n_draws
            msg = []
            for col in res.p_values:
                gc = g.create_group(col)
                gc.attrs["p_value"] = res.p_values[col]
                gc.attrs["label"] = res.labels[col]
                gc.create_dataset("grid", data=res.grid[col])
                gc.create_dataset("pred_cdf_q", data=res.pred_cdf_q[col])
                gc.create_dataset("obs_cdf_q", data=res.obs_cdf_q[col])
                gc.create_dataset("ks_obs", data=res.ks_obs[col])
                gc.create_dataset("ks_rep", data=res.ks_rep[col])
                msg.append(f"{res.labels[col]}: p = {res.p_values[col]:.3f}")
                if res.p_values[col] < 0.01:
                    print(
                        f"[ppc] WARNING {name}/{res.labels[col]}: p = "
                        f"{res.p_values[col]:.4f} — the fit does not reproduce "
                        "the observed distribution of this observable"
                    )
            print(f"[ppc] {name}: " + "; ".join(msg))
            n_done += 1
    if n_done == 0:
        raise FileNotFoundError(
            "ppc: no trace found (run `pipeline sample` / `sample_cosmo` first)"
        )
    return out


def _stage_prior_sens(cfg: PipelineConfig):
    """Prior-sensitivity battery on every saved trace → ``prior_sensitivity.h5``.

    Refit-free: each site's prior is rescaled (×0.5, ×2 by default) and the
    trace importance-reweighted (``inference/prior_sens.py``); the artifact
    records the posterior-mean shift (in posterior sds) and sd ratio of every
    site under every perturbation, plus the reweighting ESS fraction.
    """
    import h5py

    from bumpcosmology_tpu.inference.likelihoods import (
        PLPEAK_COSMO_PRIORS,
        PLPEAK_PRIORS,
        POP_COSMO_PRIORS,
        POP_PRIORS,
    )
    from bumpcosmology_tpu.inference.prior_sens import prior_sensitivity_suite
    from bumpcosmology_tpu.utils.trace import load_trace

    candidates = (
        ("pop", "trace.h5", POP_PRIORS),
        ("pop_cosmo", "trace_cosmo.h5", POP_COSMO_PRIORS),
        ("pop_plpeak", "trace_plpeak.h5", PLPEAK_PRIORS),
        ("pop_cosmo_plpeak", "trace_cosmo_plpeak.h5", PLPEAK_COSMO_PRIORS),
    )
    out = cfg.paths.path("prior_sensitivity.h5")
    n_done = 0
    with h5py.File(out, "w") as f:
        for name, fname, priors in candidates:
            path = cfg.paths.path(fname)
            if not Path(path).exists():
                continue
            post = load_trace(path).posterior
            results = prior_sensitivity_suite(post, priors)
            if not results:
                continue
            site_names = [s for s in priors if s in post]
            g = f.create_group(name)
            g.create_dataset(
                "perturbation", data=np.array([r.name for r in results], dtype="S64")
            )
            g.create_dataset("site", data=np.array(site_names, dtype="S32"))
            g.create_dataset(
                "shift_sd",
                data=np.array([[r.shift_sd[s] for s in site_names] for r in results]),
            )
            g.create_dataset(
                "sd_ratio",
                data=np.array([[r.sd_ratio[s] for s in site_names] for r in results]),
            )
            g.create_dataset("ess_frac", data=np.array([r.ess_frac for r in results]))
            worst = max(
                ((r.name, s, r.shift_sd[s]) for r in results for s in site_names
                 if r.ess_frac > 0.05),
                key=lambda t: abs(t[2]), default=None,
            )
            if worst is not None:
                print(
                    f"[prior-sens] {name}: largest reliable shift {worst[2]:+.2f} "
                    f"posterior sds on '{worst[1]}' under {worst[0]}"
                )
            for r in results:
                if r.ess_frac < 0.05:
                    print(
                        f"[prior-sens] {name}: {r.name} reweighting ESS fraction "
                        f"{r.ess_frac:.3f} < 0.05 — shift unreliable, refit to confirm"
                    )
            n_done += 1
    if n_done == 0:
        raise FileNotFoundError(
            "prior_sens: no trace found (run `pipeline sample` / `sample_cosmo` first)"
        )
    return out


def write_influence_artifact(out, model: str, names, infl: dict) -> None:
    """Persist the per-event influence summary (sites × events)."""
    import h5py

    with h5py.File(out, "w") as f:
        f.attrs["model"] = model
        f.create_dataset("event", data=np.array([str(n) for n in names], dtype="S64"))
        for site, v in infl.items():
            g = f.create_group(site)
            for k in ("mean_loo", "delta_mean", "z"):
                g.create_dataset(k, data=np.asarray(v[k]))


def _stage_figures(cfg: PipelineConfig):
    """Render all figures whose artifacts exist (L5 of the reference DAG)."""
    from bumpcosmology_tpu.figures.plots import render_all

    made = render_all(cfg, out_dir=Path(cfg.paths.data_dir) / "figures")
    print(f"[figures] wrote {len(made)} figure(s)")


def _stage_report(cfg: PipelineConfig):
    """Compile the manuscript-layer report (ms.tex / ms.md / report.pdf) —
    the reference's showyourwork/tectonic build analog (``ms.tex``,
    ``showyourwork.yml:97-111``)."""
    from bumpcosmology_tpu.figures.report import generate_report

    out = generate_report(cfg, out_dir=Path(cfg.paths.data_dir) / "report")
    print(f"[report] wrote {', '.join(str(v) for v in out.values())}")


# ------------------------------------------------------------------- assembly


def build_pipeline(cfg: PipelineConfig) -> Pipeline:
    p = cfg.paths.path
    return Pipeline(
        [
            Stage(
                "fetch",
                lambda: _stage_fetch(cfg),
                inputs=[],
                outputs=[p("input_manifest.json")],
            ),
            Stage(
                "draw_pe_samples",
                lambda: _stage_draw_pe_samples(cfg),
                inputs=[],
                outputs=[p("pe-samples.h5")],
                after=["fetch"],
            ),
            Stage(
                "draw_selection_samples",
                lambda: _stage_draw_selection_samples(cfg),
                inputs=[Path(cfg.paths.injection_file)],
                outputs=[p("selection-samples.h5")],
                after=["fetch"],
            ),
            Stage(
                "sample",
                lambda: run_pop_fit(cfg),
                inputs=[p("pe-samples.h5"), p("selection-samples.h5")],
                outputs=[p("trace.h5")],
                after=["draw_pe_samples", "draw_selection_samples"],
            ),
            Stage(
                "sample_cosmo",
                lambda: run_pop_cosmo_fit(cfg),
                inputs=[p("pe-samples.h5"), p("selection-samples.h5")],
                outputs=[p("trace_cosmo.h5")],
                after=["draw_pe_samples", "draw_selection_samples"],
            ),
            Stage(
                "mock_injections",
                lambda: _stage_mock_injections(cfg),
                outputs=[p("mock_injections.h5")],
            ),
            Stage(
                "mock_observations",
                lambda: _stage_mock_observations(cfg),
                inputs=[p("mock_injections.h5")],
                outputs=[p("mock_observations.h5")],
                after=["mock_injections"],
            ),
            Stage(
                "mock_fit_inputs",
                lambda: _stage_mock_fit_inputs(cfg),
                inputs=[p("mock_injections.h5"), p("mock_year_samples.h5")],
                outputs=[p("pe-samples.h5"), p("selection-samples.h5")],
                after=["mock_year_samples"],
            ),
            Stage(
                "sbc",
                lambda: _stage_sbc(cfg),
                outputs=[p("sbc_ranks.h5")],
            ),
            Stage(
                "score_check",
                lambda: _stage_score_check(cfg),
                outputs=[p("score_check.h5")],
            ),
            Stage(
                "loo",
                lambda: _stage_loo(cfg),
                inputs=[
                    p("pe-samples.h5"),
                    p("selection-samples.h5"),
                    p("trace_cosmo.h5" if cfg.loo.model == "pop_cosmo" else "trace.h5"),
                ],
                outputs=[p("influence.h5")],
                after=["sample_cosmo" if cfg.loo.model == "pop_cosmo" else "sample"],
            ),
            Stage(
                "compare",
                lambda: _stage_compare(cfg),
                inputs=[
                    p("pe-samples.h5"),
                    p("selection-samples.h5"),
                    p("trace.h5"),
                    p("trace_cosmo.h5"),
                ],
                outputs=[p("model_compare.h5")],
                after=["sample", "sample_cosmo"],
            ),
            Stage(
                "ppc",
                lambda: _stage_ppc(cfg),
                inputs=[
                    p("pe-samples.h5"),
                    p("selection-samples.h5"),
                    p("trace.h5"),
                ],
                outputs=[p("ppc.h5")],
                after=["sample"],
            ),
            Stage(
                "prior_sens",
                lambda: _stage_prior_sens(cfg),
                inputs=[p("trace.h5")],
                outputs=[p("prior_sensitivity.h5")],
                after=["sample"],
            ),
            Stage(
                "mock_year_samples",
                lambda: _stage_mock_year_samples(cfg),
                inputs=[p("mock_injections.h5"), p("mock_observations.h5")],
                outputs=[p("mock_year_samples.h5")],
                after=["mock_observations"],
            ),
            Stage(
                "figures",
                lambda: _stage_figures(cfg),
                inputs=[p("trace.h5"), p("trace_cosmo.h5")],
                outputs=[],
            ),
            Stage(
                "report",
                lambda: _stage_report(cfg),
                inputs=[p("trace.h5"), p("trace_cosmo.h5")],
                outputs=[],
                after=["figures"],
            ),
        ]
    )
