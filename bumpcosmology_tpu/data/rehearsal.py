"""Rehearsal fixtures: format-faithful GWTC / endo3 input files.

This environment has no egress, so the real Zenodo inputs
(:mod:`bumpcosmology_tpu.data.fetch`) cannot be downloaded.  This module
generates a *rehearsal catalog* from the mock universe that reproduces the
real releases' on-disk layout exactly — the same HDF5 group names, structured
dtypes, FAR columns, and Ndraw attributes that
:func:`bumpcosmology_tpu.data.gwtc.extract_posterior_samples` /
:func:`~bumpcosmology_tpu.data.gwtc.extract_selection_samples` probe on real
files — so the *real* ingestion code paths (group detection, prior
reweighting, m2/Neff rejection, FAR cuts, Ndraw bookkeeping) are exercised
end to end without network access.

Layout fidelity (cf. reference ``weighting.py:74-81,105-148``):

* O3a (GWTC-2.1) PE files carry a ``PublicationSamples/posterior_samples``
  structured dataset plus sibling per-waveform analyses (``C01:IMRPhenomPv2``);
* O3b (GWTC-3) files carry ``C01:Mixed/posterior_samples`` and **no**
  ``PublicationSamples`` group;
* the injection file carries an ``injections`` group with
  ``mass1_source``/``mass2_source``/``redshift``, the two sampling-pdf
  columns whose product (×m1) is the per-draw pdraw, the four search FAR
  columns, and the ``n_accepted``/``n_rejected``/``total_generated`` +
  analysis-time attributes.

Statistical exactness: stored "posterior samples" are distributed as
likelihood × LALInference prior.  Mock PE draws come from the Gaussian
measurement law of :func:`~bumpcosmology_tpu.mock.catalog.draw_mock_pe_samples`
(≡ likelihood × its analytic frame-Jacobian weight) and are importance-
resampled by ``li_prior_wt / jacobian_wt`` — an exact change of target, not an
approximation — so ingestion's ``default_pop_wt / li_prior_wt`` reweighting
sees the same law it would on real files.  Candidate events whose resampling
weights are heavy-tailed (generation Neff below ``4·nsamp_store``) or that
would fail ingestion outright are skipped, mirroring how real low-Neff events
are rejected at ingestion (``weighting.py:98-100``).
"""
from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from bumpcosmology_tpu.data.weights import default_pop_wt, li_prior_wt, planck18_dl_np
from bumpcosmology_tpu.models.mass import MBH_MIN

__all__ = ["write_rehearsal_catalog"]

_SECONDS_PER_YEAR = 3600.0 * 24.0 * 365.25

_PE_DTYPE = np.dtype(
    [
        ("mass_1_source", "<f8"),
        ("mass_2_source", "<f8"),
        ("mass_ratio", "<f8"),
        ("chirp_mass_source", "<f8"),
        ("total_mass_source", "<f8"),
        ("redshift", "<f8"),
        ("luminosity_distance", "<f8"),
        ("log_likelihood", "<f8"),
    ]
)


def _pe_record_array(m1, q, z, rng) -> np.ndarray:
    """Pack (m1, q, z) posterior draws into the GWTC structured dtype."""
    arr = np.zeros(len(m1), dtype=_PE_DTYPE)
    arr["mass_1_source"] = m1
    arr["mass_2_source"] = q * m1
    arr["mass_ratio"] = q
    arr["chirp_mass_source"] = m1 * q**0.6 / (1.0 + q) ** 0.2
    arr["total_mass_source"] = m1 * (1.0 + q)
    arr["redshift"] = z
    # GWTC releases store dL in Mpc; ingestion never reads it (z is the
    # sampled coordinate), but layout tests and real tooling expect Mpc scale
    arr["luminosity_distance"] = planck18_dl_np(z) * 1e3
    arr["log_likelihood"] = rng.normal(50.0, 3.0, size=len(m1))
    return arr


def _write_o3a_file(path: Path, samples: np.ndarray, rng) -> None:
    """GWTC-2.1 layout: PublicationSamples + sibling waveform analyses."""
    with h5py.File(path, "w") as f:
        f.create_group("PublicationSamples").create_dataset(
            "posterior_samples", data=samples
        )
        # sibling analyses real files carry; a thinned shuffle stands in for
        # the per-waveform reruns
        for ana in ("C01:IMRPhenomPv2", "C01:SEOBNRv4PHM"):
            sub = samples[rng.permutation(len(samples))[: max(len(samples) // 2, 4)]]
            f.create_group(ana).create_dataset("posterior_samples", data=sub)
        f.attrs["catalog"] = "GWTC-2.1 (rehearsal)"


def _write_o3b_file(path: Path, samples: np.ndarray, rng) -> None:
    """GWTC-3 layout: C01:Mixed primary analysis, no PublicationSamples."""
    with h5py.File(path, "w") as f:
        f.create_group("C01:Mixed").create_dataset("posterior_samples", data=samples)
        sub = samples[rng.permutation(len(samples))[: max(len(samples) // 2, 4)]]
        f.create_group("C01:IMRPhenomXPHM").create_dataset("posterior_samples", data=sub)
        f.attrs["catalog"] = "GWTC-3 (rehearsal)"


def _write_injection_file(path: Path, campaign, rng, detection_snr: float = 10.0) -> None:
    """endo3-layout injection file from a mock campaign DataFrame.

    ``pdraw_mqz`` factorizes back into the file's two sampling-pdf columns:
    pdraw(m1,q,z) = [p(m1,m2)·m1]·p(z), so ``mass1_source_mass2_source_
    sampling_pdf = pdraw_mqz / (m1·p(z))`` and the ingestion-side product
    pdf_m1m2 · pdf_z · m1 (``gwtc.py:109-113``) reproduces pdraw exactly.
    """
    from bumpcosmology_tpu.mock.catalog import Z_HORIZON
    from bumpcosmology_tpu.mock.sampling import MadauZPDF

    # "accepted" = rows whose SNR was computed (passed the z/chirp-distance
    # precut, cf. mock_injections.py:38); the rest are the file's n_rejected
    snr = campaign["SNR"].to_numpy()
    acc = snr > 0.0
    n_total = len(campaign)
    n_acc = int(np.count_nonzero(acc))

    m1 = campaign["m1"].to_numpy()[acc]
    q = campaign["q"].to_numpy()[acc]
    z = campaign["z"].to_numpy()[acc]
    pdraw = campaign["pdraw_mqz"].to_numpy()[acc]
    snr = snr[acc]

    pz = MadauZPDF(zmax=Z_HORIZON)(z)
    pdf_z = pz
    pdf_m1m2 = pdraw / (m1 * pz)

    # Search FARs: a smooth SNR→FAR map per search (decades per unit SNR,
    # jittered per-pipeline) whose FAR<1/yr contour sits at the campaign's
    # detection threshold — the file's detection semantics IS the FAR cut.
    fars = {}
    for i, name in enumerate(
        ("far_pycbc_hyperbank", "far_pycbc_bbh", "far_gstlal", "far_mbta")
    ):
        jitter = rng.normal(0.0, 0.3, size=n_acc) + 0.15 * i
        fars[name] = 10.0 ** (1.2 * (detection_snr - snr) + jitter)

    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group("injections")
        g.create_dataset("mass1_source", data=m1)
        g.create_dataset("mass2_source", data=q * m1)
        g.create_dataset("redshift", data=z)
        g.create_dataset("mass1_source_mass2_source_sampling_pdf", data=pdf_m1m2)
        g.create_dataset("redshift_sampling_pdf", data=pdf_z)
        g.create_dataset("optimal_snr_net", data=snr)
        for name, v in fars.items():
            g.create_dataset(name, data=v)
        f.attrs["n_accepted"] = n_acc
        f.attrs["n_rejected"] = n_total - n_acc
        f.attrs["total_generated"] = n_total
        f.attrs["start_time_s"] = 0.0
        f.attrs["end_time_s"] = _SECONDS_PER_YEAR  # one year of analysis time
        f.attrs["name"] = "rehearsal o3 bbhpop"


def write_rehearsal_catalog(
    pe_dir,
    injection_path,
    n_events: int = 6,
    nsamp_store: int = 2048,
    campaign_ndraw: int = 120_000,
    threshold: float = 20.0,
    seed: int = 11,
    snr_chunk: int = 16384,
    use_real_inventory: bool = False,
) -> int:
    """Generate a full rehearsal input set; returns the number of PE files.

    With ``use_real_inventory=True`` the files carry the EXACT 56 Zenodo
    release filenames of the reference build (33 GWTC-2.1 + 23 GWTC-3,
    ``/root/reference/Snakefile:3-58`` via :data:`fetch.ZENODO_FILES`), with
    the real per-catalog HDF5 layouts — so a live environment needs zero
    new code between ``pipeline fetch`` succeeding and the fits running:
    the rehearsal exercises the identical glob, event-name regex, per-layout
    reader and rejection path as real data.  ``n_events`` is forced to 56.

    Parameters
    ----------
    pe_dir:
        Directory receiving the per-event GWTC-layout ``.h5`` files
        (alternating GWTC-2.1 / GWTC-3 layouts).
    injection_path:
        Path of the endo3-layout injection file.
    n_events:
        PE files to write (candidates failing the heavy-tail/ingestion
        viability screens are skipped and replaced by the next candidate).
    nsamp_store:
        Posterior samples stored per event (real releases store tens of
        thousands; ingestion subsamples to its own ``nsamp``).
    campaign_ndraw:
        Mock injection-campaign size backing both the injection file and the
        observed events.
    threshold:
        Observed-SNR detection cut for the *PE events* (high values pick loud,
        well-measured events); the injection file's FAR map stays anchored at
        the standard SNR≈10 detection threshold.
    """
    from bumpcosmology_tpu.mock.catalog import (
        add_observation_noise,
        draw_injection_campaign,
        draw_mock_pe_samples,
    )

    pe_dir = Path(pe_dir)
    injection_path = Path(injection_path)
    pe_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    inventory = None
    if use_real_inventory:
        from bumpcosmology_tpu.data.fetch import ZENODO_FILES

        inventory = [name for _, name in ZENODO_FILES]
        n_events = len(inventory)  # the full 56-file release set

    campaign = draw_injection_campaign(
        ndraw=campaign_ndraw, seed=seed + 1000, snr_chunk=snr_chunk
    )
    _write_injection_file(injection_path, campaign, rng)

    obs = add_observation_noise(campaign, seed=seed + 2000, threshold=threshold)
    if len(obs) == 0:
        raise ValueError(
            f"no detections at threshold {threshold} in a {campaign_ndraw}-draw campaign"
        )

    # candidate order ∝ population weight, as a real catalog's event mix
    wt = default_pop_wt(
        obs["m1"].to_numpy(), obs["q"].to_numpy(), obs["z"].to_numpy()
    ) / obs["pdraw_mqz"].to_numpy()
    order = rng.choice(len(obs), size=len(obs), p=wt / wt.sum(), replace=False)

    written = 0
    for cand in order:
        if written >= n_events:
            break
        row = obs.iloc[cand]
        size = 16 * nsamp_store
        stored = None
        while size <= 256 * nsamp_store:
            m1s, qs, zs, w_mock = draw_mock_pe_samples(
                row["log_mc_obs"], row["sigma_log_mc"],
                row["q_obs"], row["sigma_q"],
                row["log_dl_obs"], row["sigma_log_dl"],
                size=size, output_source_frame=True, rng=rng,
            )
            # exact retarget: Gaussian-law draws ~ L·w_mock → resample by
            # li_prior/w_mock so stored samples ~ L·li_prior
            r = li_prior_wt(m1s, qs, zs) / w_mock
            neff = np.sum(r) ** 2 / np.sum(r * r)
            if neff >= 4 * nsamp_store:
                pick = rng.choice(size, size=nsamp_store, p=r / r.sum())
                stored = (m1s[pick], qs[pick], zs[pick])
                break
            size *= 4
        if stored is None:
            continue  # heavy-tailed retarget weights — skip, as ingestion would

        m1s, qs, zs = stored
        # ingestion-viability screen: the file must not be DOA at the real
        # m2/Neff cuts (a margin over the 2·nsamp=256 bar at nsamp=128)
        if np.median(qs * m1s) < MBH_MIN + 0.25:
            continue
        w_ing = default_pop_wt(m1s, qs, zs) / li_prior_wt(m1s, qs, zs)
        w_ing = w_ing / w_ing.sum()
        if 1.0 / np.sum(w_ing * w_ing) < 320.0:
            continue

        samples = _pe_record_array(m1s, qs, zs, rng)
        if inventory is not None:
            # exact Zenodo filename; layout follows the catalog the name
            # belongs to (GWTC2p1 -> O3a PublicationSamples layout,
            # GWTC3p0 -> O3b C01:Mixed layout)
            name = inventory[written]
            if "GWTC2p1" in name:
                _write_o3a_file(pe_dir / name, samples, rng)
            else:
                _write_o3b_file(pe_dir / name, samples, rng)
        elif written % 2 == 0:
            evt = f"GW{190400 + written:06d}_{int(rng.integers(0, 235959)):06d}"
            name = f"IGWN-GWTC2p1-v2-{evt}_PEDataRelease_mixed_nocosmo.h5"
            _write_o3a_file(pe_dir / name, samples, rng)
        else:
            evt = f"GW{190400 + written:06d}_{int(rng.integers(0, 235959)):06d}"
            name = f"IGWN-GWTC3p0-v1-{evt}_PEDataRelease_mixed_nocosmo.h5"
            _write_o3b_file(pe_dir / name, samples, rng)
        written += 1

    if written < min(n_events, 3):
        raise ValueError(
            f"only {written} viable rehearsal events from {len(obs)} detections; "
            "increase campaign_ndraw or lower threshold"
        )
    return written
