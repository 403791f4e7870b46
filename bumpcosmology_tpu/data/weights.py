"""Population and PE-prior weights at fixed Planck18 (L3, host-side numpy).

Re-design of ``src/scripts/weighting.py:33-46,173-180``: the importance
weights used at ingestion time (reweighting GWTC PE samples to the fiducial
population and converting pdraw between source and detector frames).  These
run once per catalog on the host, in float64, against the precomputed
Planck18 master table (astropy-free).
"""
from __future__ import annotations

import numpy as np

from bumpcosmology_tpu.models.cosmology import _PLANCK18_NP, HUBBLE_DISTANCE_H
from bumpcosmology_tpu.models.parameters import DEFAULT_POPULATION, PLANCK18
from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv

__all__ = [
    "planck18_efunc_np",
    "planck18_dc_np",
    "planck18_dl_np",
    "planck18_z_of_dl_np",
    "planck18_dvc_dz_np",
    "default_pop_wt",
    "li_prior_wt",
    "dm1sqz_dm1ddqdl",
]

_DH = HUBBLE_DISTANCE_H / PLANCK18.h  # Gpc


def planck18_efunc_np(z):
    opz = 1.0 + np.asarray(z, dtype=np.float64)
    # full flat-wCDM E(z); for PLANCK18 (w = -1) the DE term reduces to a
    # constant, but don't bake that in lest the fiducial constants change
    de = (1.0 - PLANCK18.Om) * opz ** (3.0 * (1.0 + PLANCK18.w))
    return np.sqrt(PLANCK18.Om * opz**3 + de)


def planck18_dc_np(z):
    """Comoving distance [Gpc]."""
    t = _PLANCK18_NP
    return np.interp(np.asarray(z, dtype=np.float64), t["z"], t["dc"])


def planck18_dl_np(z):
    """Luminosity distance [Gpc]."""
    t = _PLANCK18_NP
    return np.interp(np.asarray(z, dtype=np.float64), t["z"], t["dl"])


def planck18_z_of_dl_np(dl):
    t = _PLANCK18_NP
    return np.interp(np.asarray(dl, dtype=np.float64), t["dl"], t["z"])


def planck18_dvc_dz_np(z):
    """dVc/dz [Gpc^3], full 4π solid angle."""
    t = _PLANCK18_NP
    return np.interp(np.asarray(z, dtype=np.float64), t["z"], t["dvc"])


# the fiducial population, built once (cf. ``weighting.py:28``)
_DEFAULT_POP = None


def _default_pop():
    global _DEFAULT_POP
    if _DEFAULT_POP is None:
        _DEFAULT_POP = build_population(DEFAULT_POPULATION)
    return _DEFAULT_POP


def default_pop_wt(m1, q, z):
    """Weight in (m1, q, z) of the fiducial population x comoving-volume
    measure (``weighting.py:33-36``): e^{log dN} · dVc/dz/(1+z)."""
    m1 = np.asarray(m1, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    log_dn = np.asarray(log_dndmdqdv(_default_pop(), m1, q, z), dtype=np.float64)
    return np.exp(log_dn) * planck18_dvc_dz_np(z) / (1.0 + z)


def li_prior_wt(m1, q, z, cosmology_weighted: bool = False):
    """LALInference/Bilby PE prior over (m1, q, z) (``weighting.py:38-46``).

    Default: uniform in detector-frame masses and dL² — the Jacobian to
    source frame gives (1+z)² m1 dL² (dC + (1+z) dH/E).  With
    ``cosmology_weighted``: uniform-in-comoving-volume-and-source-time
    redshift weighting.
    """
    m1 = np.asarray(m1, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    if cosmology_weighted:
        return (1.0 + z) ** 2 * m1 * planck18_dvc_dz_np(z) / (1.0 + z)
    dl = planck18_dl_np(z)
    dc = planck18_dc_np(z)
    return (1.0 + z) ** 2 * m1 * dl**2 * (dc + (1.0 + z) * _DH / planck18_efunc_np(z))


def dm1sqz_dm1ddqdl(m1, q, z):
    """|∂(m1_src, q, z)/∂(m1_det, q, dL)| at fixed Planck18
    (``weighting.py:173-180``)."""
    z = np.asarray(z, dtype=np.float64)
    dc = planck18_dc_np(z)
    return 1.0 / (1.0 + z) / (dc + (1.0 + z) * _DH / planck18_efunc_np(z))
