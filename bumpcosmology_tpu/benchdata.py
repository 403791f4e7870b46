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

__all__ = ["mock_pop_data", "mock_pop_cosmo_data"]


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
        # estimator stays unbiased with Ndraw scaled accordingly)
        extra = det.iloc[rng.choice(len(det), size=nsel - nsel_eff)]
        import pandas as pd

        sel = pd.concat([sel, extra], ignore_index=True)
        ndraw = float(len(inj)) * (nsel / len(det))
    else:
        ndraw = float(len(inj)) * (nsel_eff / len(det))
    return stacks, sel, ndraw


def mock_pop_data(
    nobs=56, nsamp=128, nsel=1024, ndraw_campaign=300_000, threshold=20.0, seed=7000
) -> PopData:
    """Reference-scale source-frame catalog from the fiducial population."""
    (m1, q, z, wt), sel, ndraw = _catalog(nobs, nsamp, nsel, ndraw_campaign, threshold, seed)
    return make_pop_data(
        m1, q, z, wt,
        sel["m1"].to_numpy(), sel["q"].to_numpy(), sel["z"].to_numpy(),
        sel["pdraw_mqz"].to_numpy(), ndraw=ndraw,
    )


def mock_pop_cosmo_data(
    nobs=56, nsamp=128, nsel=1024, ndraw_campaign=300_000, threshold=20.0, seed=7000
) -> PopCosmoData:
    """Reference-scale detector-frame catalog (m1_det, q, dL) with the
    pdraw Jacobian conversion of ``run_cosmo_fit.py:22-30``."""
    from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_dl_np

    (m1, q, z, wt), sel, ndraw = _catalog(nobs, nsamp, nsel, ndraw_campaign, threshold, seed)
    m1d = m1 * (1.0 + z)
    dl = planck18_dl_np(z)
    pdraw_cosmo = wt * dm1sqz_dm1ddqdl(m1, q, z)

    sm1 = sel["m1"].to_numpy()
    sq = sel["q"].to_numpy()
    sz = sel["z"].to_numpy()
    spd = sel["pdraw_mqz"].to_numpy()
    return make_pop_cosmo_data(
        m1d, q, dl, pdraw_cosmo,
        sm1 * (1.0 + sz), sq, planck18_dl_np(sz), spd * dm1sqz_dm1ddqdl(sm1, sq, sz),
        ndraw=ndraw,
    )
