"""PISN-bump black-hole mass function (L1).

Physics (cf. ``src/scripts/intensity_models.py:15-151``): the BH mass function
is the CO core-mass function pushed through the (stochastic) core-remnant
relation,

    dN/dm = ∫ dm_CO dN/dm_CO · N(m | mu(m_CO), sigma),

where ``mu`` is the identity below ``mpisn`` and an inverted parabola peaking
at ``mbhmax`` (pulsational pair-instability pile-up), plus a power-law tail of
slope ``-c`` that turns on smoothly at ``mbhmax`` with relative amplitude
``fpl``.

TPU-first design notes
----------------------
* The bump integral is evaluated on a static ``(n_m, n_m)`` grid
  (``DEFAULT_N_GRID = 256`` like the reference, ``intensity_models.py:92``)
  whose *coordinates* depend on the sampled hyperparameters but whose *shape*
  never does, so one XLA compilation serves every NUTS leapfrog step.
* The BH-mass grid is uniform, so the per-sample table lookup is O(1)
  arithmetic (:func:`~bumpcosmology_tpu.ops.interp.interp_unit_spaced`), not a
  binary search.
* Everything is a pure function of a :class:`MassParams` pytree; the built
  table travels in a :class:`MassFunctionTable` NamedTuple (also a pytree), so
  the whole construction inlines into the jitted potential and XLA fuses the
  Gaussian-kernel fill with the log-trapezoid reduction.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.models.parameters import MassParams
from bumpcosmology_tpu.ops.integrate import log_trapz
from bumpcosmology_tpu.ops.interp import interp_unit_spaced

__all__ = [
    "MBH_MIN",
    "MREF",
    "DEFAULT_N_GRID",
    "mean_mbh_from_mco",
    "largest_mco",
    "log_dndm_co",
    "log_smooth_turnon",
    "pisn_bump_log_dndm_grid",
    "MassFunctionTable",
    "build_mass_function",
    "log_dndm",
]

MBH_MIN = 5.0  # hard lower cutoff on BH masses (``intensity_models.py:13``)
MREF = 30.0  # normalization pivot: m * dN/dm = 1 at MREF (``intensity_models.py:129,138``)
MCO_BREAK = 20.0  # CO-mass broken-power-law break (``intensity_models.py:41``)
DEFAULT_N_GRID = 256
_GRID_MBH_LO = 3.0  # bump-grid lower edge (``intensity_models.py:97``)
_GRID_MCO_LO = 1.0  # CO-mass grid lower edge (``intensity_models.py:98``)


def mean_mbh_from_mco(mco, mpisn, mbhmax):
    """Mean remnant BH mass from CO core mass (``intensity_models.py:15-25``).

    Identity below ``mpisn``; above, an inverted parabola that peaks at
    ``mbhmax`` and is C1-smooth at the junction.
    """
    curv = 1.0 / (4.0 * (mpisn - mbhmax))
    mco_peak = 2.0 * mbhmax - mpisn
    return jnp.where(mco < mpisn, mco, mbhmax + curv * jnp.square(mco - mco_peak))


def largest_mco(mpisn, mbhmax):
    """Largest CO core mass yielding a positive BH mass (``intensity_models.py:27-30``)."""
    mco_peak = 2.0 * mbhmax - mpisn
    return mco_peak + jnp.sqrt(4.0 * mbhmax * (mbhmax - mpisn))


def log_dndm_co(mco, a, b):
    """Broken power law CO core-mass function, break at 20 Msun (``intensity_models.py:32-43``)."""
    x = jnp.log(mco / MCO_BREAK)
    return jnp.where(mco < MCO_BREAK, -a * x, -b * x)


def log_smooth_turnon(m, mmin, width=0.05):
    """log of a logistic 0->1 turn-on at ``mmin`` (``intensity_models.py:45-54``).

    Stable form: log(2·sigmoid(x)) = log 2 − softplus(−x); never overflows in
    float32 (the reference's ``log1p(exp(-x))`` overflows for deeply negative
    arguments before the log rescues it — here softplus linearizes instead).
    """
    dm = mmin * width
    return math.log(2.0) - jax.nn.softplus(-(m - mmin) / dm)


_BUMP_KERNEL_OVERRIDE = None  # None = by backend; "pallas" | "jax"


def set_bump_kernel(mode) -> None:
    """Force the bump-grid implementation: ``"pallas"`` (fused TPU kernel with
    analytic VJP, :mod:`bumpcosmology_tpu.ops.pallas_bump`), ``"jax"`` (plain
    jnp), or ``None`` (pallas on TPU, jnp elsewhere)."""
    global _BUMP_KERNEL_OVERRIDE
    assert mode in (None, "pallas", "jax")
    _BUMP_KERNEL_OVERRIDE = mode


def _use_pallas_bump() -> bool:
    if _BUMP_KERNEL_OVERRIDE is not None:
        return _BUMP_KERNEL_OVERRIDE == "pallas"
    return False  # opt-in via set_bump_kernel("pallas") (TPU only)


def pisn_bump_log_dndm_grid(params: MassParams, n_grid: int = DEFAULT_N_GRID):
    """Tabulate log dN/dm of the PISN bump on a uniform BH-mass grid.

    Returns ``(mbh_lo, dmbh, log_dn)`` where the grid is
    ``mbh[i] = mbh_lo + i*dmbh`` with ``i in [0, n_grid)`` spanning
    ``[3, mbhmax + 7 sigma]`` (``intensity_models.py:96-108``).  The CO-mass
    integration grid spans ``[1, largest_mco]``.  The (n_grid, n_grid)
    Gaussian-kernel fill + log-trapezoid is the hottest table build of the
    likelihood; on TPU it runs as one fused Pallas kernel with a hand-derived
    backward (:func:`bumpcosmology_tpu.ops.pallas_bump.bump_log_dn_pallas`),
    elsewhere as a jnp elementwise+reduce subgraph XLA fuses itself.
    """
    mbh_hi = params.mbhmax + 7.0 * params.sigma
    dmbh = (mbh_hi - _GRID_MBH_LO) / (n_grid - 1)

    if _use_pallas_bump():
        from bumpcosmology_tpu.ops.pallas_bump import bump_log_dn_pallas

        log_dn = bump_log_dn_pallas(
            params.a, params.b, params.mpisn, params.mbhmax, params.sigma, n_grid
        )
        return _GRID_MBH_LO, dmbh, log_dn

    mco_hi = largest_mco(params.mpisn, params.mbhmax)
    mbh = jnp.linspace(_GRID_MBH_LO, mbh_hi, n_grid)
    mco = jnp.linspace(_GRID_MCO_LO, mco_hi, n_grid)

    log_kernel = (
        log_dndm_co(mco[None, :], params.a, params.b)
        - 0.5 * jnp.square((mbh[:, None] - mean_mbh_from_mco(mco[None, :], params.mpisn, params.mbhmax)) / params.sigma)
        - 0.5 * math.log(2.0 * math.pi)
        - jnp.log(params.sigma)
    )
    log_dn = log_trapz(log_kernel, mco[None, :], axis=1)
    return _GRID_MBH_LO, dmbh, log_dn


class MassFunctionTable(NamedTuple):
    """Precomputed mass-function state — a pytree, valid for one draw of ``params``."""

    params: MassParams
    mbh_lo: jnp.ndarray  # uniform bump-grid origin (static value 3.0, kept traced)
    dmbh: jnp.ndarray  # uniform bump-grid spacing
    mbh_hi: jnp.ndarray  # bump-grid upper edge (= mbhmax + 7 sigma)
    log_bump: jnp.ndarray  # (n_grid,) log dN/dm of the bump on the uniform grid
    log_pl_norm: jnp.ndarray  # amplitude of the power-law tail at mbhmax
    log_norm: jnp.ndarray  # overall normalization: m·dN/dm = 1 at MREF


def _log_dndm_unnormed(table: MassFunctionTable, m):
    """Bump + tail without the overall normalization (``intensity_models.py:140-149``)."""
    m = jnp.asarray(m)
    p = table.params
    log_bump = interp_unit_spaced(m, table.mbh_lo, table.dmbh, table.log_bump)
    # Hard-zero the bump outside its tabulated support (constant extrapolation
    # would otherwise leak the edge values; ``intensity_models.py:144-145``).
    log_bump = jnp.where((m <= table.mbh_lo) | (m >= table.mbh_hi), -jnp.inf, log_bump)
    log_tail = (
        -p.c * jnp.log(m / p.mbhmax) + table.log_pl_norm + log_smooth_turnon(m, p.mbhmax)
    )
    out = jnp.logaddexp(log_bump, log_tail)
    return jnp.where(m < MBH_MIN, -jnp.inf, out)


def build_mass_function(params: MassParams, n_grid: int = DEFAULT_N_GRID) -> MassFunctionTable:
    """Build the full mass-function table for one hyperparameter draw.

    Mirrors ``LogDNDM.__post_init__`` (``intensity_models.py:134-138``):
    tabulate the bump, anchor the power-law tail at ``fpl`` times the bump
    amplitude at ``mbhmax``, then normalize so that ``m dN/dm = 1`` at
    ``MREF = 30``.
    """
    mbh_lo, dmbh, log_bump = pisn_bump_log_dndm_grid(params, n_grid)
    mbh_hi = params.mbhmax + 7.0 * params.sigma
    log_pl_norm = jnp.log(params.fpl) + interp_unit_spaced(
        params.mbhmax, mbh_lo, dmbh, log_bump
    )
    table = MassFunctionTable(
        params=params,
        mbh_lo=jnp.asarray(mbh_lo, dtype=log_bump.dtype),
        dmbh=dmbh,
        mbh_hi=mbh_hi,
        log_bump=log_bump,
        log_pl_norm=log_pl_norm,
        log_norm=jnp.asarray(0.0, dtype=log_bump.dtype),
    )
    log_norm = -(_log_dndm_unnormed(table, jnp.asarray(MREF)) + math.log(MREF))
    return table._replace(log_norm=log_norm)


def log_dndm(table: MassFunctionTable, m):
    """log dN/dm at BH mass(es) ``m`` (``LogDNDM.__call__``, ``intensity_models.py:140-151``)."""
    return _log_dndm_unnormed(table, m) + table.log_norm
