"""Hyperparameter pytrees for the population and cosmology models (L1).

The reference keeps hyperparameters as loose dataclass fields rebuilt eagerly
in ``__post_init__`` (``src/scripts/intensity_models.py:56-273``) and fiducial
values in ``weighting.py:11-26``.  Here parameters are immutable NamedTuples —
natural JAX pytrees — and all derived tables are built by *pure jitted
functions* of these pytrees, so NUTS re-traces cleanly and shapes stay static.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "MassParams",
    "RedshiftParams",
    "CosmoParams",
    "PopulationParams",
    "DEFAULT_MASS",
    "DEFAULT_REDSHIFT",
    "DEFAULT_RATE",
    "DEFAULT_POPULATION",
    "PLANCK18",
]


class MassParams(NamedTuple):
    """Mass-function hyperparameters (cf. ``intensity_models.py:113-151``).

    a, b    : CO core-mass broken-power-law slopes (break at 20 Msun)
    c       : power-law-tail slope above the bump
    mpisn   : BH mass where the CO-remnant relation turns over (Msun)
    mbhmax  : maximum BH mass of the relation (Msun)
    sigma   : Gaussian scatter around the CO-remnant relation (Msun)
    fpl     : relative amplitude of the power-law tail at mbhmax
    beta    : total-mass pairing power (cf. ``intensity_models.py:210``)
    """

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    mpisn: jnp.ndarray
    mbhmax: jnp.ndarray
    sigma: jnp.ndarray
    fpl: jnp.ndarray
    beta: jnp.ndarray


class RedshiftParams(NamedTuple):
    """Madau-Dickinson merger-rate hyperparameters (``intensity_models.py:153-173``)."""

    lam: jnp.ndarray
    kappa: jnp.ndarray
    zp: jnp.ndarray


class CosmoParams(NamedTuple):
    """Flat wCDM cosmology parameters (``intensity_models.py:212-256``)."""

    h: jnp.ndarray
    Om: jnp.ndarray
    w: jnp.ndarray


class PopulationParams(NamedTuple):
    """Full population hyperparameter set for the joint intensity."""

    mass: MassParams
    redshift: RedshiftParams


# Fiducial "truth" parameters: a reasonable O3a fit (``weighting.py:11-26``).
DEFAULT_MASS = MassParams(
    a=1.8, b=-0.71, c=2.9, mpisn=31.0, mbhmax=36.0, sigma=2.3, fpl=0.21, beta=-2.2
)
DEFAULT_REDSHIFT = RedshiftParams(lam=4.7, kappa=7.0, zp=3.0)
DEFAULT_RATE = 2.3  # R: mergers / Gpc^3 / yr at the (mref, qref, zref) pivot
DEFAULT_POPULATION = PopulationParams(mass=DEFAULT_MASS, redshift=DEFAULT_REDSHIFT)

# Planck 2018 flat LambdaCDM (TT,TE,EE+lowE+lensing+BAO): H0 = 67.66 km/s/Mpc,
# Om0 = 0.30966.  The reference uses ``astropy.cosmology.Planck18`` for its
# fixed-cosmology weights (``intensity_models.py:326``, ``weighting.py:36``);
# astropy additionally carries radiation/neutrino densities which are
# negligible (< 1e-4 relative) over the z <= 3.5 range of the catalogs.
PLANCK18 = CosmoParams(h=0.6766, Om=0.30966, w=-1.0)
