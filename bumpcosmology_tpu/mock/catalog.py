"""Mock-universe pipeline: injection campaign → observations → PE catalog.

Re-design of the reference's three mock stages
(``src/scripts/mock_injections.py``, ``mock_observations.py``,
``mock_one_year_samples.py``; Snakefile rules 98-125) with the SNR loop moved
from a CPU fork pool to the on-device batched kernel
(:mod:`bumpcosmology_tpu.mock.snr`).

Stage outputs are pandas DataFrames with the reference's column conventions
so downstream artifacts are drop-in compatible.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from bumpcosmology_tpu.data.weights import (
    default_pop_wt,
    planck18_dc_np,
    planck18_dl_np,
    planck18_efunc_np,
    planck18_z_of_dl_np,
    _DH,
)
from bumpcosmology_tpu.mock.sampling import MadauZPDF, PowerLawPDF
from bumpcosmology_tpu.mock.snr import network_snr_batched
from bumpcosmology_tpu.models.parameters import DEFAULT_RATE

__all__ = [
    "Z_HORIZON",
    "CHIRP_DIST_MIN",
    "DETECTION_SNR",
    "draw_injection_campaign",
    "campaign_summary",
    "add_observation_noise",
    "Uncertainties",
    "draw_mock_pe_samples",
    "draw_one_year_catalog",
]

Z_HORIZON = 3.5  # ``mock_injections.py:28``
CHIRP_DIST_MIN = 1.5  # ``mock_injections.py:29``
DETECTION_SNR = 10.0  # ``mock_injections.py:199``, ``mock_observations.py:12``


def draw_injection_campaign(
    ndraw: int = 10_000_000,
    seed: int = 333_165_393,
    z_horizon: float = Z_HORIZON,
    chirp_dist_min: float = CHIRP_DIST_MIN,
    snr_chunk: int = 65536,
    psds=None,
) -> pd.DataFrame:
    """Draw the synthetic injection campaign and compute network SNRs.

    Source distribution (``mock_injections.py:145-158``):
      p(m1) ∝ m1^-2.35 on [5, 500];  p(mtot|m1) ∝ mtot^-2 on [m1+5, 2 m1];
      p(z): Madau(2.7, 5.6, 1.9) x comoving measure to z_horizon;
      isotropic angles; Gaussian spin components sigma = 0.2/sqrt(3)
      (carried for catalog parity; the amplitude model is non-spinning —
      see :mod:`bumpcosmology_tpu.mock.waveform`).

    The z/chirp-distance precut (``mock_injections.py:38``) zeroes SNRs
    outside the detectable region without wasting device time on them.
    """
    rng = np.random.default_rng(seed)

    zpdf = MadauZPDF(zmax=z_horizon)
    z = zpdf.icdf(rng.uniform(size=ndraw))

    mpdf = PowerLawPDF(2.35, 5.0, 500.0)
    m1 = mpdf.icdf(rng.uniform(size=ndraw))

    mtpdf = PowerLawPDF(2.0, m1 + 5.0, 2.0 * m1)
    mt = mtpdf.icdf(rng.uniform(size=ndraw))
    m2 = mt - m1
    q = m2 / m1

    # pdraw over (m1, q, z): p(m1) p(mt|m1) |dmt/dq| p(z), |dmt/dq| = m1
    pdraw = mpdf(m1) * (mtpdf(mt) * m1) * zpdf(z)

    iota = np.arccos(rng.uniform(-1.0, 1.0, size=ndraw))
    ra = rng.uniform(0.0, 2.0 * np.pi, size=ndraw)
    dec = np.arcsin(rng.uniform(-1.0, 1.0, size=ndraw))
    psi = rng.uniform(0.0, np.pi, size=ndraw)
    gmst = rng.uniform(0.0, 2.0 * np.pi, size=ndraw)
    s1 = rng.normal(0.0, 0.2 / math.sqrt(3.0), size=(3, ndraw))
    s2 = rng.normal(0.0, 0.2 / math.sqrt(3.0), size=(3, ndraw))

    dl = planck18_dl_np(z)
    mc_det = m1 * (1.0 + z) * q ** 0.6 / (1.0 + q) ** 0.2
    chirp_dist = mc_det ** (5.0 / 6.0) / dl
    compute = (z < z_horizon) & (chirp_dist > chirp_dist_min)

    snr_cols = {k: np.zeros(ndraw) for k in ("SNR_H1", "SNR_L1", "SNR_V1", "SNR")}
    idx = np.flatnonzero(compute)
    if idx.size:
        snrs = network_snr_batched(
            m1[idx] * (1.0 + z[idx]),
            m2[idx] * (1.0 + z[idx]),
            dl[idx],
            iota[idx],
            ra[idx],
            dec[idx],
            psi[idx],
            gmst[idx],
            chunk=snr_chunk,
            psds=psds,
        )
        snr_cols["SNR_H1"][idx] = snrs["H1"]
        snr_cols["SNR_L1"][idx] = snrs["L1"]
        snr_cols["SNR_V1"][idx] = snrs["V1"]
        snr_cols["SNR"][idx] = snrs["net"]

    return pd.DataFrame(
        {
            "m1": m1,
            "q": q,
            "z": z,
            "iota": iota,
            "ra": ra,
            "dec": dec,
            "psi": psi,
            "gmst": gmst,
            "s1x": s1[0],
            "s1y": s1[1],
            "s1z": s1[2],
            "s2x": s2[0],
            "s2y": s2[1],
            "s2z": s2[2],
            "pdraw_mqz": pdraw,
            **snr_cols,
        }
    )


def campaign_summary(df: pd.DataFrame, threshold: float = DETECTION_SNR) -> dict:
    """Detection-rate diagnostics (``mock_injections.py:199-207``)."""
    det = df[df["SNR"] > threshold]
    wt = default_pop_wt(det["m1"].to_numpy(), det["q"].to_numpy(), det["z"].to_numpy()) / det[
        "pdraw_mqz"
    ].to_numpy()
    nex = DEFAULT_RATE * np.sum(wt) / len(df)
    neff = np.sum(wt) ** 2 / np.sum(wt**2) if len(det) else 0.0
    return {
        "n_detected": int(len(det)),
        "predicted_detections_per_year": float(nex),
        "neff_default_pop": float(neff),
        "expected_pop_draws": float(np.sum(wt) / np.max(wt)) if len(det) else 0.0,
    }


@dataclass
class Uncertainties:
    """GWTC-3-calibrated measurement uncertainties (``mock_observations.py:14-27``)."""

    sigma_log_mc: np.ndarray
    sigma_q: np.ndarray
    sigma_log_dl: np.ndarray

    @classmethod
    def from_snr(cls, snr):
        snr = np.asarray(snr, dtype=np.float64)
        return cls(0.05 * 20.0 / snr, 0.07 * 20.0 / snr, 0.2 * 20.0 / snr)


def add_observation_noise(
    inj: pd.DataFrame, seed: int = 181_286_134, threshold: float = DETECTION_SNR
) -> pd.DataFrame:
    """Observed SNRs and point estimates for detected injections
    (``mock_observations.py:30-51``): SNR_OBS = SNR + N(0, sqrt(3)); detection
    at SNR_OBS > threshold; noisy (log Mc_det, q, log dL) point estimates."""
    rng = np.random.default_rng(seed)
    inj = inj.copy()
    inj["SNR_OBS"] = inj["SNR"] + rng.normal(0.0, math.sqrt(3.0), size=len(inj))
    det = inj[inj["SNR_OBS"] > threshold].copy()

    det["mc"] = det["m1"] * det["q"] ** 0.6 / (1.0 + det["q"]) ** 0.2
    det["dl"] = planck18_dl_np(det["z"].to_numpy())
    det["mc_det"] = det["mc"] * (1.0 + det["z"])

    unc = Uncertainties.from_snr(det["SNR_OBS"].to_numpy())
    det["sigma_log_mc"] = unc.sigma_log_mc
    det["log_mc_obs"] = rng.normal(np.log(det["mc_det"].to_numpy()), unc.sigma_log_mc)
    det["sigma_q"] = unc.sigma_q
    det["q_obs"] = rng.normal(det["q"].to_numpy(), unc.sigma_q)
    det["sigma_log_dl"] = unc.sigma_log_dl
    det["log_dl_obs"] = rng.normal(np.log(det["dl"].to_numpy()), unc.sigma_log_dl)
    return det


def draw_mock_pe_samples(
    log_mc_obs,
    sigma_log_mc,
    q_obs,
    sigma_q,
    log_dl_obs,
    sigma_log_dl,
    size=1,
    output_source_frame=False,
    rng=None,
):
    """Gaussian mock PE samples in (log Mc_det, q, log dL), q truncated to
    [0, 1] (``weighting.py:182-215``).

    The reference truncates q by rejection-redraw; the resulting law is a
    truncated normal, which we sample directly by inverse CDF — identical
    distribution, but no quasi-hang when a noisy ``q_obs`` lands far outside
    [0, 1] (rejection acceptance can drop below 1e-5 there).

    With ``output_source_frame``: convert to (m1_src, q, z) and return the
    analytic PE prior weight 1/m1 · 1/dL (dC + (1+z) dH/E).
    """
    from scipy.special import ndtr, ndtri

    if rng is None:
        rng = np.random.default_rng()
    log_mcs = rng.normal(log_mc_obs, sigma_log_mc, size=size)
    c_lo = ndtr((0.0 - q_obs) / sigma_q)
    c_hi = ndtr((1.0 - q_obs) / sigma_q)
    u = rng.uniform(c_lo, c_hi, size=size)
    # clip away exact 0/1 quantiles (ndtri(-inf/inf)) from extreme q_obs
    u = np.clip(u, 1e-12, 1.0 - 1e-12)
    qs = np.clip(q_obs + sigma_q * ndtri(u), 0.0, 1.0)
    log_dls = rng.normal(log_dl_obs, sigma_log_dl, size=size)

    mcs = np.exp(log_mcs)
    m1s = mcs / (qs**0.6 / (1.0 + qs) ** 0.2)
    dls = np.exp(log_dls)

    if not output_source_frame:
        return m1s, qs, dls, 1.0 / m1s / dls

    z = planck18_z_of_dl_np(dls)
    m1_src = m1s / (1.0 + z)
    prior_wt = (
        1.0 / m1_src / dls * (planck18_dc_np(z) + (1.0 + z) * _DH / planck18_efunc_np(z))
    )
    return m1_src, qs, z, prior_wt


def draw_one_year_catalog(
    n_total_injections: int,
    obs: pd.DataFrame,
    nsamp: int = 128,
    seed: int = 177_043_409,
    rate: float = DEFAULT_RATE,
) -> pd.DataFrame:
    """Poisson-draw a one-year catalog with mock PE samples
    (``mock_one_year_samples.py``).

    Expected count nex = R Σ wt / N_total over detected injections; events
    drawn ∝ wt without replacement; per event, PE samples importance-drawn
    with adaptive size-doubling until Neff ≥ 2·nsamp.
    """
    rng = np.random.default_rng(seed)
    pop_wt = default_pop_wt(obs["m1"].to_numpy(), obs["q"].to_numpy(), obs["z"].to_numpy())
    wt = pop_wt / obs["pdraw_mqz"].to_numpy()
    nex = rate * np.sum(wt) / n_total_injections
    n = rng.poisson(nex)
    n = min(n, len(obs))
    ne = np.sum(wt) ** 2 / np.sum(wt**2)
    print(f"[mock] catalog Neff={ne:.1f}, drawing {n} events (nex={nex:.1f})")
    inds = rng.choice(len(wt), size=n, p=wt / np.sum(wt), replace=False)

    frames = []
    for i in range(n):
        row = obs.iloc[inds[i]]
        size = 32 * nsamp
        while True:
            m, q, z, w = draw_mock_pe_samples(
                row["log_mc_obs"],
                row["sigma_log_mc"],
                row["q_obs"],
                row["sigma_q"],
                row["log_dl_obs"],
                row["sigma_log_dl"],
                size=size,
                output_source_frame=True,
                rng=rng,
            )
            pw = default_pop_wt(m, q, z)
            rw = pw / w
            neff = np.sum(rw) ** 2 / np.sum(rw**2)
            if neff < 2 * nsamp:
                size *= 2
                continue
            pick = rng.choice(len(rw), size=nsamp, p=rw / np.sum(rw))
            frames.append(
                pd.DataFrame(
                    {"m1": m[pick], "q": q[pick], "z": z[pick], "wt": pw[pick], "evt": inds[i]}
                )
            )
            break
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["m1", "q", "z", "wt", "evt"]
    )
