"""BROKEN POWER LAW black-hole mass model — the third mass-model family (L1).

The GWTC phenomenological alternative (LVK GWTC-2/GWTC-3 population papers,
appendix-B "BROKEN POWER LAW" model): the primary-mass density is a power law
with a break,

    p(m1) ∝ m1^{-α1}                      mmin < m1 < mbreak
    p(m1) ∝ m1^{-α2} · mbreak^{α2-α1}     mbreak ≤ m1 < mmax
    mbreak = mmin + b·(mmax − mmin)

times the Planck-taper turn-on S(m1 | mmin, δ_m), continuous at the break;
the mass-ratio pairing is the same power law q^{β_q}·S(q·m1) (normalized over
q per primary mass) as the POWER-LAW+PEAK family, so this module reuses
:func:`~bumpcosmology_tpu.models.plpeak.log_planck_taper` and the shared
q-normalization table builder verbatim.

Like PLPeak (``models/plpeak.py``) there is no reference code for this
family — the reference paper fits its physical bump model against the
phenomenological standards, and a reference user switching here gets all
three LVK-fiducial shapes under one likelihood/pipeline skeleton with a
shared pivot convention (m·dN/dm1 dq dV dt = 1 at (MREF, QREF, ZREF)), so
rates, figures, SBC, and ``pipeline compare`` are apples-to-apples across
families.

TPU-first notes: the primary-mass density is pure elementwise math (two
power-law branches via ``where``; the break selection is data-independent
branching that XLA fuses into the log-weight chain), and the only table is
the shared (β_q, mmin, δ_m) q-normalization grid — this is the cheapest
family per likelihood eval.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from bumpcosmology_tpu.models.mass import MREF
from bumpcosmology_tpu.models.parameters import RedshiftParams
from bumpcosmology_tpu.models.plpeak import (
    DEFAULT_N_M,
    DEFAULT_N_Q,
    M_TAB_HI,
    M_TAB_LO,
    QREF,
    WALL_SLOPE,
    _log_nq_grid,
    _log_pl_norm_inv,
    log_planck_taper,
)
from bumpcosmology_tpu.models.redshift import ZREF, log_dndv
from bumpcosmology_tpu.ops.interp import interp_unit_spaced

__all__ = [
    "BrokenPLMassParams",
    "BrokenPLPopulationParams",
    "BrokenPLIntensity",
    "DEFAULT_BROKENPL_MASS",
    "DEFAULT_BROKENPL_POPULATION",
    "log_pm1_brokenpl",
    "build_brokenpl_population",
]


class BrokenPLMassParams(NamedTuple):
    """BROKEN POWER LAW hyperparameters (GWTC table notation).

    alpha1 : power-law slope below the break, p(m1) ∝ m1^{-alpha1}
    alpha2 : power-law slope above the break
    bfrac  : break location as a fraction of (mmax - mmin), in (0, 1)
    beta_q : mass-ratio pairing power, p(q|m1) ∝ q^{beta_q}
    mmin   : minimum BH mass (taper onset) [Msun]
    mmax   : power-law truncation mass [Msun]
    delta_m: taper width [Msun]
    """

    alpha1: jnp.ndarray
    alpha2: jnp.ndarray
    bfrac: jnp.ndarray
    beta_q: jnp.ndarray
    mmin: jnp.ndarray
    mmax: jnp.ndarray
    delta_m: jnp.ndarray


class BrokenPLPopulationParams(NamedTuple):
    """Full hyperparameter set: BrokenPL mass family × Madau-Dickinson redshift."""

    mass: BrokenPLMassParams
    redshift: RedshiftParams


# GWTC-2 BROKEN POWER LAW median-ish fiducials (for mocks/tests).
DEFAULT_BROKENPL_MASS = BrokenPLMassParams(
    alpha1=1.6, alpha2=5.6, bfrac=0.43, beta_q=1.4, mmin=4.0, mmax=87.0, delta_m=4.8,
)
DEFAULT_BROKENPL_POPULATION = BrokenPLPopulationParams(
    mass=DEFAULT_BROKENPL_MASS,
    redshift=RedshiftParams(lam=4.7, kappa=7.0, zp=3.0),
)


def log_pm1_brokenpl(p: BrokenPLMassParams, m1):
    """log of the normalized-then-tapered primary-mass density.

    The un-tapered broken power law is normalized analytically: with
    I1 = ∫_mmin^mbreak m^{-α1} dm and I2 = mbreak^{α2-α1} ∫_mbreak^mmax
    m^{-α2} dm (both via the ``expm1(x)/x`` form of
    :func:`~bumpcosmology_tpu.models.plpeak._log_pl_norm_inv`, exact and
    gradient-stable through α → 1), the normalizer is I1 + I2 by continuity
    at the break.  The Planck taper is applied on top (the GWTC convention —
    the taper mass is *not* re-normalized; the pivot normalization applied
    by :func:`build_brokenpl_population` absorbs it).
    """
    m1 = jnp.asarray(m1)
    mbreak = p.mmin + p.bfrac * (p.mmax - p.mmin)
    log_lo = -p.alpha1 * jnp.log(m1)
    log_hi = -p.alpha2 * jnp.log(m1) + (p.alpha2 - p.alpha1) * jnp.log(mbreak)
    log_i1 = _log_pl_norm_inv(p.alpha1, p.mmin, mbreak)
    log_i2 = (p.alpha2 - p.alpha1) * jnp.log(mbreak) + _log_pl_norm_inv(
        p.alpha2, mbreak, p.mmax
    )
    log_norm = jnp.logaddexp(log_i1, log_i2)
    out = (
        jnp.where(m1 < mbreak, log_lo, log_hi)
        - log_norm
        + log_planck_taper(m1, p.mmin, p.delta_m)
    )
    # Soft walls (see models/plpeak.py WALL_SLOPE): the taper's soft wall
    # already handles m1 ≤ mmin; the mmax truncation and the q-table edge
    # are linear log-density ramps instead of −∞, so the likelihood stays
    # finite with informative gradients at every hyperparameter draw.
    #
    # The table-edge wall sits exactly at M_TAB_HI (not inside it): brokenpl's
    # mmax prior is Uniform(50, 200) = Uniform(50, M_TAB_HI), and a wall at
    # M_TAB_HI − 10 would dominate the model's own truncation for
    # mmax ∈ (190, 200], making that prior slice likelihood-degenerate
    # (round-4 advisor finding).  In (190, 200] the q-norm table is still
    # in-range (no extrapolation), and beyond M_TAB_HI the 25 nats/Msun ramp
    # swamps the table's constant extrapolation within a fraction of a Msun.
    # plpeak keeps its interior wall — its mmax prior tops out at 100.
    return (
        out
        - WALL_SLOPE * jnp.maximum(m1 - p.mmax, 0.0)
        - WALL_SLOPE * jnp.maximum(m1 - M_TAB_HI, 0.0)
    )


class BrokenPLIntensity(NamedTuple):
    """Per-draw BrokenPL population state: params + shared q-norm table.

    A pytree with the same ``log_dndmdqdv`` method contract as the bump and
    PLPeak intensities, so every likelihood/deterministic/figure path that
    consumes an intensity works unchanged.
    """

    params: BrokenPLPopulationParams
    m_lo: jnp.ndarray
    dm: jnp.ndarray
    log_nq: jnp.ndarray  # (n_m,) log ∫ dq q^β S(q·m1) on the uniform m1 grid
    log_norm: jnp.ndarray  # pivot normalization (MREF, QREF, ZREF)

    def log_dndmdqdv(self, m1, q, z):
        """log dN/dm1/dq/dV/dt at (m1, q, z) under the pivot convention."""
        p = self.params
        m1 = jnp.asarray(m1)
        q = jnp.asarray(q)
        z = jnp.asarray(z)
        log_nq = interp_unit_spaced(m1, self.m_lo, self.dm, self.log_nq)
        return (
            log_pm1_brokenpl(p.mass, m1)
            + p.mass.beta_q * jnp.log(q)
            + log_planck_taper(q * m1, p.mass.mmin, p.mass.delta_m)
            - log_nq
            + log_dndv(z, p.redshift)
            + self.log_norm
        )


def build_brokenpl_population(
    params: BrokenPLPopulationParams, n_m: int = DEFAULT_N_M, n_q: int = DEFAULT_N_Q
) -> BrokenPLIntensity:
    """Build the per-draw BrokenPL intensity (q-norm table + pivot normalization)."""
    p = params.mass
    dm, log_nq = _log_nq_grid(p.beta_q, p.mmin, p.delta_m, n_m, n_q)
    intensity = BrokenPLIntensity(
        params=params,
        m_lo=jnp.asarray(M_TAB_LO, dtype=log_nq.dtype),
        dm=dm,
        log_nq=log_nq,
        log_norm=jnp.asarray(0.0, dtype=log_nq.dtype),
    )
    mref = jnp.asarray(MREF)
    log_at_pivot = intensity.log_dndmdqdv(mref, jnp.asarray(QREF), jnp.asarray(ZREF))
    log_norm = -(log_at_pivot + math.log(MREF))
    return intensity._replace(log_norm=log_norm)
