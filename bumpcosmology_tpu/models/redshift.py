"""Madau-Dickinson-like merger-rate density over redshift (L1).

    dN/dV/dt ∝ (1+z)^lam / (1 + ((1+z)/(1+zp))^kappa),

normalized to 1 at ``zref = 0`` (cf. ``src/scripts/intensity_models.py:153-173``).
Pure closed form — no tables needed.
"""
from __future__ import annotations

import jax.numpy as jnp

from bumpcosmology_tpu.models.parameters import RedshiftParams

__all__ = ["log_dndv", "ZREF"]

ZREF = 0.0


def _log_shape(z, params: RedshiftParams):
    return params.lam * jnp.log1p(z) - jnp.log1p(
        ((1.0 + z) / (1.0 + params.zp)) ** params.kappa
    )


def log_dndv(z, params: RedshiftParams, zref: float = ZREF):
    """log merger-rate density (per comoving volume per source time) at ``z``.

    Normalized so the value at ``zref`` is 0 (``intensity_models.py:167-173``).
    """
    z = jnp.asarray(z)
    return _log_shape(z, params) - _log_shape(jnp.asarray(zref), params)
