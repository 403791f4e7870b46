"""Synthetic data helpers shared by tests, bench, and the graft entry points.

These produce *statistically crude but numerically realistic* catalogs at
arbitrary shapes (the real mock pipeline in :mod:`bumpcosmology_tpu.mock`
produces physically calibrated ones; this module only needs the likelihood to
be well-conditioned at reference scale).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from bumpcosmology_tpu.inference.likelihoods import (
    PopCosmoData,
    PopData,
    make_pop_cosmo_data,
    make_pop_data,
)
from bumpcosmology_tpu.models import dl_at_z, planck18_table

__all__ = ["synthetic_pop_data", "synthetic_pop_cosmo_data"]


def _source_frame(nobs, nsamp, nsel, seed):
    rng = np.random.default_rng(seed)
    m1 = rng.uniform(8.0, 70.0, size=(nobs, nsamp))
    q = rng.uniform(0.3, 1.0, size=(nobs, nsamp))
    z = rng.uniform(0.02, 1.5, size=(nobs, nsamp))
    pdraw = rng.uniform(0.5, 2.0, size=(nobs, nsamp))
    m1_s = rng.uniform(8.0, 70.0, size=nsel)
    q_s = rng.uniform(0.3, 1.0, size=nsel)
    z_s = rng.uniform(0.02, 1.5, size=nsel)
    pd_s = rng.uniform(0.5, 2.0, size=nsel)
    return m1, q, z, pdraw, m1_s, q_s, z_s, pd_s


def synthetic_pop_data(nobs=56, nsamp=128, nsel=1024, seed=0) -> PopData:
    """Reference-scale (``SURVEY.md §6``) source-frame catalog."""
    return make_pop_data(*_source_frame(nobs, nsamp, nsel, seed), ndraw=float(nsel * 100))


def synthetic_pop_cosmo_data(nobs=56, nsamp=128, nsel=1024, seed=0) -> PopCosmoData:
    """Reference-scale detector-frame catalog (m1_det, q, dL)."""
    m1, q, z, pd, m1s, qs, zs, pds = _source_frame(nobs, nsamp, nsel, seed)
    table = planck18_table()
    dl = np.asarray(dl_at_z(table, jnp.asarray(z)))
    dls = np.asarray(dl_at_z(table, jnp.asarray(zs)))
    return make_pop_cosmo_data(
        m1 * (1 + z), q, dl, pd, m1s * (1 + zs), qs, dls, pds, ndraw=float(nsel * 100)
    )
