"""The eight paper figures (L5).

One function per reference figure script (``src/scripts/dNdm_fitted.py``,
``cosmo_params_corner.py``, ``h_zoomin.py``, ``omh2_zoomin.py``,
``shape_corner.py``, ``m1-vs-m2.py``, ``dNdm_PISN_effects.py``,
``mock_observation_corner.py``), reading this framework's HDF5 traces/tables
instead of arviz NetCDF / pandas-pytables stores.

Each function takes explicit input/output paths and returns the output path;
the CLI in ``figures.__main__`` maps names to functions.
"""
from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import scipy.stats as ss
import seaborn as sns

from bumpcosmology_tpu.models.population import COORDS
from bumpcosmology_tpu.utils.io import read_table
from bumpcosmology_tpu.utils.trace import load_trace

__all__ = [
    "FIGURES",
    "dndm_fitted",
    "cosmo_params_corner",
    "h_zoomin",
    "omh2_zoomin",
    "shape_corner",
    "m1_vs_m2",
    "dndm_pisn_effects",
    "mock_observation_corner",
]


def _finish(out):
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    plt.tight_layout()
    plt.savefig(out)
    plt.close("all")
    return out


def _corner(df: pd.DataFrame):
    pg = sns.PairGrid(df, diag_sharey=False)
    pg.map_diag(sns.kdeplot)
    pg.map_lower(sns.kdeplot)
    pg.map_upper(sns.scatterplot, s=4, alpha=0.4)
    return pg


def dndm_fitted(trace_path, out="figures/dNdm_fitted.pdf"):
    """Posterior-predictive band of m·dN/dm at (q=1, z=0) (``dNdm_fitted.py``).

    When other-family fits of the same catalog exist alongside
    (``trace_plpeak.h5`` / ``trace_brokenpl.h5`` next to ``trace_path``),
    their bands are overlaid — all families share the pivot convention, so
    the curves are directly comparable."""
    sns.set_palette("colorblind")
    tr = load_trace(trace_path)
    dn = tr.posterior["mdNdmdVdt_fixed_qz"].reshape(-1, 128)
    x = COORDS["m_grid"]
    med = np.median(dn, axis=0)
    q16, q84 = np.quantile(dn, [0.16, 0.84], axis=0)
    q025, q975 = np.quantile(dn, [0.025, 0.975], axis=0)

    plt.figure()
    (line,) = plt.plot(x[1:], med[1:], label=str(tr.attrs.get("family", "bump")))
    plt.fill_between(x[1:], q84[1:], q16[1:], color=line.get_color(), alpha=0.25)
    plt.fill_between(x[1:], q975[1:], q025[1:], color=line.get_color(), alpha=0.25)
    overlaid = False
    for fam, style in (("plpeak", "--"), ("brokenpl", ":")):
        sibling = Path(trace_path).with_name(f"trace_{fam}.h5")
        if sibling.exists() and str(sibling) != str(trace_path):
            dn2 = load_trace(sibling).posterior["mdNdmdVdt_fixed_qz"].reshape(-1, 128)
            med2 = np.median(dn2, axis=0)
            p16, p84 = np.quantile(dn2, [0.16, 0.84], axis=0)
            (l2,) = plt.plot(x[1:], med2[1:], ls=style, label=fam)
            plt.fill_between(x[1:], p84[1:], p16[1:], color=l2.get_color(), alpha=0.18)
            overlaid = True
    if overlaid:
        plt.legend(fontsize=8)
    plt.xlabel(r"$m_1 / M_\odot$")
    plt.ylabel(
        r"$\left. m_1 \mathrm{d}N/\mathrm{d}m_1 \mathrm{d}q \mathrm{d}V \mathrm{d}t"
        r" \right|_{q=1,z=0} / \mathrm{Gpc}^{-3}\,\mathrm{yr}^{-1}$"
    )
    plt.xscale("log")
    plt.yscale("log")
    return _finish(out)


def cosmo_params_corner(trace_path, out="figures/cosmo_params_corner.pdf"):
    """(h, Om, w, mpisn, mbhmax, sigma) corner from the joint fit."""
    tr = load_trace(trace_path)
    labels = {
        "h": r"$h$",
        "Om": r"$\Omega_M$",
        "w": r"$w$",
        "mpisn": r"$m_\mathrm{PISN}$",
        "mbhmax": r"$m_\mathrm{BH,max}$",
        "sigma": r"$\sigma$",
    }
    df = pd.DataFrame({lab: tr.posterior[k].reshape(-1) for k, lab in labels.items()})
    _corner(df)
    return _finish(out)


def h_zoomin(trace_path, out="figures/h_zoomin.pdf"):
    """Posterior vs truncated-normal prior for h (``h_zoomin.py``)."""
    sns.set_palette("colorblind")
    tr = load_trace(trace_path)
    plt.figure()
    sns.kdeplot(tr.posterior["h"].reshape(-1), label="Posterior")
    x = np.linspace(0.35, 1.4, 1024)
    d = ss.norm(loc=0.7, scale=0.2)
    plt.plot(x, d.pdf(x) / (d.cdf(1.4) - d.cdf(0.35)), color="k", label="Prior")
    plt.xlim(0.35, 1.4)
    plt.xlabel(r"$h$")
    plt.legend()
    return _finish(out)


def omh2_zoomin(trace_path, out="figures/omh2_zoomin.pdf", seed=194658662):
    """Posterior vs prior for ω_M = Ω_M h² (``omh2_zoomin.py``)."""
    sns.set_palette("colorblind")
    rng = np.random.default_rng(seed)
    tr = load_trace(trace_path)
    omh2_post = (tr.posterior["Om"] * tr.posterior["h"] ** 2).reshape(-1)

    # prior draws by rejection, as the reference does (``omh2_zoomin.py:18-29``)
    h = rng.normal(0.7, 0.2, size=40000)
    om = rng.normal(0.3, 0.15, size=40000)
    ok = (h >= 0.35) & (h <= 1.4) & (om >= 0) & (om <= 1)
    omh2_prior = (om[ok] * h[ok] ** 2)[:4000]

    plt.figure()
    sns.kdeplot(omh2_post, label="Posterior")
    sns.kdeplot(omh2_prior, label="Prior", color="k")
    plt.xlim(0, 0.5)
    plt.xlabel(r"$\omega_M \equiv \Omega_M h^2$")
    plt.legend()
    return _finish(out)


def shape_corner(trace_path, out="figures/shape_corner.pdf"):
    """(mpisn, mbhmax, sigma) corner from the population fit."""
    tr = load_trace(trace_path)
    labels = {"mpisn": r"$m_\mathrm{PISN}$", "mbhmax": r"$m_\mathrm{BH,max}$", "sigma": r"$\sigma$"}
    df = pd.DataFrame({lab: tr.posterior[k].reshape(-1) for k, lab in labels.items()})
    _corner(df)
    return _finish(out)


def m1_vs_m2(pe_samples_path, out="figures/m1-vs-m2.pdf"):
    """Per-event m1-m2 KDE contours of the PE catalog (``m1-vs-m2.py``)."""
    samples = read_table(pe_samples_path)
    events = samples.groupby("evt")
    plt.figure()
    with sns.color_palette("husl", n_colors=max(events.ngroups, 1)):
        for evt, s in events:
            sns.kdeplot(x=s["m1"], y=s["m1"] * s["q"], levels=[0.1, 0.5], alpha=0.25)
    plt.xlabel(r"$m_1 / M_\odot$")
    plt.ylabel(r"$m_2 / M_\odot$")
    plt.xscale("log")
    plt.yscale("log")
    plt.xlim(5)
    plt.ylim(5)
    return _finish(out)


def dndm_pisn_effects(out="figures/dNdm_PISN_effects.pdf"):
    """Sensitivity of the PISN bump shape to its parameters (``dNdm_PISN_effects.py``)."""
    import jax.numpy as jnp

    from bumpcosmology_tpu.models.mass import pisn_bump_log_dndm_grid
    from bumpcosmology_tpu.models.parameters import DEFAULT_MASS
    from bumpcosmology_tpu.ops.interp import interp_unit_spaced

    p = DEFAULT_MASS
    m = np.linspace(5.0, 45.0, 1024)

    def bump_pdf(**kw):
        params = p._replace(**kw)
        lo, dm, log_dn = pisn_bump_log_dndm_grid(params)
        vals = np.exp(np.asarray(interp_unit_spaced(jnp.asarray(m), lo, dm, log_dn)))
        return vals / np.trapezoid(vals, m)

    plt.figure()
    with sns.color_palette("husl", n_colors=5):
        plt.plot(m, bump_pdf(), label="Default")
        plt.plot(m, bump_pdf(mpisn=p.mpisn * 1.1, mbhmax=p.mbhmax * 1.1), label="Mass + 10%")
        plt.plot(m, bump_pdf(sigma=p.sigma - 1), label=r"$\sigma - 1$")
        plt.plot(m, bump_pdf(mpisn=p.mpisn * 1.1), label=r"$m_\mathrm{PISN} + 10\%$")
        plt.plot(m, bump_pdf(mbhmax=p.mbhmax * 1.1), label=r"$m_\mathrm{BH,max} + 10\%$")
    plt.legend()
    plt.xlabel(r"$m / M_\odot$")
    plt.ylabel(r"$p(m)$")
    return _finish(out)


def mock_observation_corner(
    observations_path, out="figures/mock_observation_corner.pdf", seed=278954249
):
    """Mock PE corner for one random event with truth lines
    (``mock_observation_corner.py``)."""
    from bumpcosmology_tpu.data.weights import planck18_dl_np
    from bumpcosmology_tpu.mock.catalog import draw_mock_pe_samples

    sns.set_palette("colorblind")
    rng = np.random.default_rng(seed)
    obs = read_table(observations_path, key="observations")
    obs["m1_det"] = obs["m1"] * (1 + obs["z"])
    obs["dl_true"] = planck18_dl_np(obs["z"].to_numpy())

    row = obs.iloc[int(rng.integers(len(obs)))]
    m1d, q, dl, _ = draw_mock_pe_samples(
        row["log_mc_obs"], row["sigma_log_mc"], row["q_obs"], row["sigma_q"],
        row["log_dl_obs"], row["sigma_log_dl"], size=1000, rng=rng,
    )
    pg = _corner(
        pd.DataFrame({r"$m_{1,\mathrm{det}}$": m1d, r"$q$": q, r"$d_L/\mathrm{Gpc}$": dl})
    )
    truths = [row["m1_det"], row["q"], row["dl_true"]]
    for j in range(3):
        for i in range(3):
            pg.axes[i, j].axvline(truths[j], color="k")
            if i != j:
                pg.axes[i, j].axhline(truths[i], color="k")
    return _finish(out)


def sbc_ranks_hist(ranks_path, out="figures/sbc_ranks.pdf"):
    """SBC rank histograms per site with a 99% uniform band (9th figure —
    beyond reference parity; validates the whole inference stack via
    Talts et al. 2018 rank uniformity)."""
    import h5py

    with h5py.File(ranks_path, "r") as f:
        model = f.attrs.get("model", "pop")
        g = f["ranks"]
        n_bins_total = int(np.asarray(g["n_bins"]))
        ranks = {
            k: np.asarray(g[k]) for k in g.keys() if k != "n_bins"
        }
        pvals = dict(f["pvalues"].attrs) if "pvalues" in f else {}

    sites = sorted(ranks.keys())
    ncol = 4
    nrow = (len(sites) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 2.2 * nrow), squeeze=False)
    for ax in axes.flat[len(sites):]:
        ax.set_axis_off()
    for ax, site in zip(axes.flat, sites):
        r = ranks[site]
        n = len(r)
        k = max(2, min(10, n // 5))
        edges = np.linspace(0, n_bins_total, k + 1)
        ax.hist(r, bins=edges, color="C0", alpha=0.8)
        # pointwise 99% band for a uniform multinomial
        mean = n / k
        lo, hi = ss.binom.ppf([0.005, 0.995], n, 1.0 / k)
        ax.axhspan(lo, hi, color="k", alpha=0.12, lw=0)
        ax.axhline(mean, color="k", lw=0.8, ls="--")
        p = pvals.get(site)
        label = site if p is None else f"{site}  (p={p:.2f})"
        ax.set_title(label, fontsize=9)
        ax.set_xlim(0, n_bins_total)
    fig.suptitle(f"SBC rank histograms — {model} model ({n} simulations)")
    return _finish(out)


def event_influence(influence_path, out="figures/event_influence.pdf", top_sites=12):
    """Per-event leave-one-out influence heatmap (sites × events, in
    full-posterior-sd units) from the ``loo`` pipeline stage's artifact.
    Beyond reference parity: flags events that single-handedly move a
    hyperparameter (|z| ≳ 1)."""
    import h5py

    with h5py.File(influence_path, "r") as f:
        model = f.attrs.get("model", "?")
        events = [e.decode() for e in f["event"][:]]
        z = {k: np.asarray(f[k]["z"]) for k in f.keys() if k != "event"}

    # rank sites by their largest single-event influence
    sites = sorted(z, key=lambda s: -np.max(np.abs(z[s])))[:top_sites]
    mat = np.stack([z[s] for s in sites])
    lim = max(1.0, float(np.max(np.abs(mat))))
    fig, ax = plt.subplots(
        figsize=(max(6.0, 0.28 * len(events) + 2.0), 0.4 * len(sites) + 1.6)
    )
    im = ax.imshow(mat, aspect="auto", cmap="RdBu_r", vmin=-lim, vmax=lim)
    ax.set_yticks(range(len(sites)))
    ax.set_yticklabels(sites, fontsize=8)
    step = max(1, len(events) // 28)
    ax.set_xticks(range(0, len(events), step))
    ax.set_xticklabels(
        [events[i] for i in range(0, len(events), step)],
        rotation=90, fontsize=6,
    )
    ax.set_xlabel("event removed")
    fig.colorbar(im, ax=ax, label=r"$\Delta$ posterior mean / full sd")
    ax.set_title(f"Leave-one-out event influence — {model} model", fontsize=10)
    return _finish(out)


def model_compare_fig(compare_path, out="figures/model_compare.pdf"):
    """Per-event elpd difference (pop_cosmo − pop) and PSIS Pareto k̂ from
    the ``compare`` pipeline stage's artifact.  Events above the k̂ = 0.7
    line have unreliable importance ratios (influential data points)."""
    import h5py

    with h5py.File(compare_path, "r") as f:
        events = [e.decode() for e in f["event"][:]]
        elpd = {m: np.asarray(f[m]["elpd_i"]) for m in ("pop", "pop_cosmo")}
        khat = {m: np.asarray(f[m]["khat"]) for m in ("pop", "pop_cosmo")}
        best = f.attrs.get("best_model", "?")
        bf_note = ""
        if all("log_z" in f[m].attrs for m in ("pop", "pop_cosmo")):
            d_logz = float(f["pop_cosmo"].attrs["log_z"] - f["pop"].attrs["log_z"])
            bf_note = (
                f"; $\\log_{{10}}$BF(pop_cosmo/pop) = {d_logz / np.log(10.0):.1f}"
            )

    n = len(events)
    x = np.arange(n)
    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(max(6.0, 0.28 * n + 2.0), 5.4), sharex=True,
        gridspec_kw={"height_ratios": [3, 2]},
    )
    d = elpd["pop_cosmo"] - elpd["pop"]
    ax1.bar(x, d, color=np.where(d >= 0, "C0", "C3"))
    ax1.axhline(0.0, color="k", lw=0.8)
    ax1.set_ylabel(r"$\Delta$elpd$_i$ (pop_cosmo $-$ pop)")
    ax1.set_title(
        f"Predictive comparison (PSIS-LOO) — preferred: {best}{bf_note}", fontsize=10
    )
    for m, c in (("pop", "C1"), ("pop_cosmo", "C0")):
        ax2.plot(x, khat[m], ".", color=c, label=m)
    ax2.axhline(0.7, color="r", ls="--", lw=0.8, label=r"$\hat k = 0.7$")
    ax2.set_ylabel(r"Pareto $\hat k$")
    step = max(1, n // 28)
    ax2.set_xticks(x[::step])
    ax2.set_xticklabels([events[i] for i in range(0, n, step)], rotation=90, fontsize=6)
    ax2.legend(fontsize=7, loc="upper left")
    return _finish(out)


def prior_sens_fig(sens_path, out="figures/prior_sensitivity.pdf"):
    """Heatmap of posterior-mean shifts (in posterior sds) under the prior
    perturbation battery, one panel per saved trace, from the ``prior_sens``
    stage's artifact.  Cells with reweighting ESS fraction < 0.05 are hatched
    (the importance estimate there is unreliable)."""
    import h5py

    with h5py.File(sens_path, "r") as f:
        models = list(f.keys())
        data = {}
        for m in models:
            g = f[m]
            data[m] = (
                [p.decode() for p in g["perturbation"][:]],
                [s.decode() for s in g["site"][:]],
                np.asarray(g["shift_sd"]),
                np.asarray(g["ess_frac"]),
            )

    fig, axes = plt.subplots(
        len(models), 1,
        figsize=(7.5, 0.22 * sum(len(d[0]) for d in data.values()) + 1.6 * len(models)),
        squeeze=False,
    )
    for ax, m in zip(axes[:, 0], models):
        perts, sites, shift, ess = data[m]
        vmax = max(0.5, np.nanmax(np.abs(shift)))
        im = ax.imshow(shift, cmap="RdBu_r", vmin=-vmax, vmax=vmax, aspect="auto")
        for i, e in enumerate(ess):
            if e < 0.05:
                ax.axhspan(i - 0.5, i + 0.5, color="none", hatch="///", ec="0.6", lw=0)
        ax.set_yticks(range(len(perts)))
        ax.set_yticklabels(perts, fontsize=6)
        ax.set_xticks(range(len(sites)))
        ax.set_xticklabels(sites, fontsize=6, rotation=90)
        ax.set_title(f"{m}: posterior-mean shift [posterior sds]", fontsize=9)
        fig.colorbar(im, ax=ax, fraction=0.025)
    return _finish(out)


def ppc_fig(ppc_path, out="figures/ppc.pdf"):
    """Posterior-predictive CDF bands per observable and model, from the
    ``ppc`` pipeline stage's artifact: predicted detected-population CDF
    (68% band across posterior draws) vs the observed catalog's ECDF band,
    with the replication-calibrated KS p-value in each panel title."""
    import h5py

    with h5py.File(ppc_path, "r") as f:
        models = [k for k in f.keys()]
        panels = {}
        for m in models:
            for col in f[m]:
                g = f[m][col]
                panels[(m, col)] = (
                    np.asarray(g["grid"]), np.asarray(g["pred_cdf_q"]),
                    np.asarray(g["obs_cdf_q"]), float(g.attrs["p_value"]),
                    str(g.attrs["label"]),
                )

    cols = sorted({c for (_, c) in panels})
    nrow, ncol = len(models), len(cols)
    fig, axes = plt.subplots(
        nrow, ncol, figsize=(3.1 * ncol, 2.6 * nrow), squeeze=False
    )
    for i, m in enumerate(models):
        for j, col in enumerate(cols):
            ax = axes[i][j]
            if (m, col) not in panels:
                ax.axis("off")
                continue
            grid, pq, oq, p, label = panels[(m, col)]
            ax.fill_between(grid, pq[0], pq[2], color="C0", alpha=0.3,
                            label="predicted (68%)")
            ax.plot(grid, pq[1], color="C0", lw=1.0)
            ax.fill_between(grid, oq[0], oq[2], color="C3", alpha=0.25,
                            label="observed (68%)")
            ax.plot(grid, oq[1], color="C3", lw=1.0, ls="--")
            ax.set_title(f"{m}: {label}  (p = {p:.2f})", fontsize=8)
            ax.set_ylim(0, 1)
            if j == 0:
                ax.set_ylabel("CDF (detected)")
            if i == 0 and j == 0:
                ax.legend(fontsize=6, loc="lower right")
    return _finish(out)


FIGURES = {
    "dNdm_fitted": (dndm_fitted, "trace.h5"),
    "cosmo_params_corner": (cosmo_params_corner, "trace_cosmo.h5"),
    "h_zoomin": (h_zoomin, "trace_cosmo.h5"),
    "omh2_zoomin": (omh2_zoomin, "trace_cosmo.h5"),
    "shape_corner": (shape_corner, "trace.h5"),
    "m1-vs-m2": (m1_vs_m2, "pe-samples.h5"),
    "dNdm_PISN_effects": (dndm_pisn_effects, None),
    "mock_observation_corner": (mock_observation_corner, "mock_observations.h5"),
}

# Beyond-parity figures: rendered when their artifact exists, never required
# (FIGURES is the strict 8-figure reference-parity set).
EXTRA_FIGURES = {
    "sbc_ranks": (sbc_ranks_hist, "sbc_ranks.h5"),
    "event_influence": (event_influence, "influence.h5"),
    "model_compare": (model_compare_fig, "model_compare.h5"),
    "ppc": (ppc_fig, "ppc.h5"),
    "prior_sensitivity": (prior_sens_fig, "prior_sensitivity.h5"),
}


def render_all(cfg, out_dir="figures", skip_missing: bool = True, fmt: str = "pdf"):
    """Render every figure whose input artifact exists (the L5 step of the
    reference's build DAG, ``showyourwork.yml:97-111``).  Returns the list of
    written paths; with ``skip_missing`` artifacts that have not been
    produced yet (e.g. the mock branch) are skipped rather than fatal.
    ``EXTRA_FIGURES`` are always optional — ``skip_missing=False`` asserts
    only the reference-parity set."""
    out_dir = Path(out_dir)
    made = []
    for name, (fn, artifact) in FIGURES.items():
        out = out_dir / f"{name}.{fmt}"
        if artifact is None:
            made.append(fn(out=out))
            continue
        src = Path(cfg.paths.path(artifact))
        if not src.exists():
            if skip_missing:
                print(f"[figures] skipping {name}: missing {src}")
                continue
            raise FileNotFoundError(f"figure {name} needs {src}")
        made.append(fn(src, out=out))
    for name, (fn, artifact) in EXTRA_FIGURES.items():
        src = Path(cfg.paths.path(artifact))
        if src.exists():
            made.append(fn(src, out=out_dir / f"{name}.{fmt}"))
    return made
