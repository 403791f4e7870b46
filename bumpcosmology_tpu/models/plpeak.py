"""POWER-LAW + PEAK black-hole mass model — the second mass-model family (L1).

The GWTC-3 fiducial phenomenological population model (LVK, "The population
of merging compact binaries inferred using gravitational waves through
GWTC-3", §B.2): the primary-mass density is a truncated power law plus a
Gaussian peak, both multiplied by a Planck-taper turn-on at ``mmin``; the
pairing function is a power law in mass ratio with the same taper on the
secondary mass, normalized over q per primary mass,

    p(m1)      ∝ [ (1-λ)·PL(m1 | -α, mmin, mmax) + λ·N(m1 | μ_m, σ_m) ] · S(m1)
    p(q | m1)  ∝ q^{β_q} · S(q·m1) / N_q(m1),   N_q(m1) = ∫ dq q^{β_q} S(q·m1)

with S the Planck taper rising 0→1 on (mmin, mmin+δ_m).  The joint intensity
follows the framework's pivot convention (shared with the PISN-bump family,
``models/mass.py``): m·dN/dm1 dq dV dt = 1 at (MREF, QREF, ZREF), so the rate
``R`` recorded in traces means the same thing for both families and
``pipeline compare`` is apples-to-apples.

This family exists in the reference only implicitly — its paper fits the
physical bump model *against* the phenomenological standard — and is the
natural "second model" a reference user reaches for.  There is no reference
code for it; the implementation is original.

TPU-first design notes
----------------------
* Everything is analytic except the q-pairing normalization N_q(m1), which is
  tabulated once per hyperparameter draw on a **static-shape** (n_m × n_q)
  grid (parameter-dependent *values*, fixed *coordinates*) — the same
  static-shape discipline as the bump grid, but 2× smaller and elementwise
  (no Gaussian kernel fill), so a draw's table build costs less than one
  bump build.
* The primary-mass density itself needs NO table: per-sample evaluation is
  pure elementwise math that XLA fuses straight into the log-weight chain —
  this family is the cheap one on TPU.
* The truncated-power-law normalization uses the ``expm1(x)/x`` form, exact
  and gradient-stable through the α → 1 singularity in float32.
* The Planck taper is evaluated with the double-``where`` guard so reverse-mode
  gradients stay NaN-free at the branch edges (a JAX ``where``-grad hazard).
* **Soft walls** (round 4): the model's hard supports are continued as
  *linear* log-density ramps instead of −∞, so the likelihood is finite with
  informative gradients everywhere — no −∞ event marginals for prior draws
  whose support excludes an observed event, no NaN-poisoned NUTS trees, no
  divergence cliffs at the walls (round-3 measurement of the hard-wall
  version: 733/1600 divergences, R̂ = 73, all-14-site SBC failure,
  ``scratch/r3b_plpeak_tpu.log``).  Two regimes: edges where the density is
  already continuous (the ``mmax`` truncation, the q-table edge) ramp at
  ``WALL_SLOPE`` = 25 nats/Msun (spurious mass ~10⁻²³); the Planck-taper
  *foot* — doubly-exponential in the exact model — is kept exact only down
  to log S = −8 and ramps at ``FOOT_SLOPE`` = 4 nats/Msun below (spurious
  mass ~10⁻⁴ of a component, two orders under the event-marginal MC noise),
  because following the exact foot further creates a per-PE-sample
  log-weight staircase that pins ``mmin`` mixing (measured:
  ``scratch/r4_diag_plpeak.log``).  The SBC generator uses the *same*
  density (the simulator weights events by ``log_dndmdqdv``), so
  calibration is exactly self-consistent.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bumpcosmology_tpu.models.mass import MREF
from bumpcosmology_tpu.models.parameters import RedshiftParams
from bumpcosmology_tpu.models.redshift import ZREF, log_dndv
from bumpcosmology_tpu.ops.integrate import log_trapz
from bumpcosmology_tpu.ops.interp import interp_unit_spaced

__all__ = [
    "PLPeakMassParams",
    "PLPeakPopulationParams",
    "PLPeakIntensity",
    "DEFAULT_PLPEAK_MASS",
    "DEFAULT_PLPEAK_POPULATION",
    "log_planck_taper",
    "log_pm1_plpeak",
    "build_plpeak_population",
]

# Static q-normalization table coordinates.  The m1 axis must cover every
# queried primary mass for any prior draw: mmin's prior support starts at 2,
# and log N_q varies only through the S(q·m1) cut at q ≈ mmin/m1, so constant
# extrapolation above M_TAB_HI is accurate to < 1e-3 nats.
M_TAB_LO = 2.0
M_TAB_HI = 200.0
Q_TAB_LO = 1e-3  # q-quadrature lower edge (log-spaced; S cuts q < mmin/m1 anyway)
DEFAULT_N_M = 256
DEFAULT_N_Q = 128
QREF = 1.0  # pivot mass ratio, shared with the bump family (models/population.py)


class PLPeakMassParams(NamedTuple):
    """POWER-LAW+PEAK hyperparameters (GWTC-3 table notation).

    alpha   : primary-mass power-law slope, p(m1) ∝ m1^{-alpha}
    beta_q  : mass-ratio pairing power, p(q|m1) ∝ q^{beta_q}
    mmin    : minimum BH mass (taper onset) [Msun]
    mmax    : power-law truncation mass [Msun]
    lam_peak: mixture fraction in the Gaussian peak
    mu_m    : peak location [Msun]
    sigma_m : peak width [Msun]
    delta_m : taper width [Msun]
    """

    alpha: jnp.ndarray
    beta_q: jnp.ndarray
    mmin: jnp.ndarray
    mmax: jnp.ndarray
    lam_peak: jnp.ndarray
    mu_m: jnp.ndarray
    sigma_m: jnp.ndarray
    delta_m: jnp.ndarray


class PLPeakPopulationParams(NamedTuple):
    """Full hyperparameter set: PLPeak mass family × Madau-Dickinson redshift."""

    mass: PLPeakMassParams
    redshift: RedshiftParams


# GWTC-3 median-ish fiducial values (for mocks/tests; the LVK result has
# alpha≈3.5, beta≈1.1, mmin≈5, mmax≈87, lambda≈0.04, mu≈34, sigma≈3.6, dm≈4.9).
DEFAULT_PLPEAK_MASS = PLPeakMassParams(
    alpha=3.5, beta_q=1.1, mmin=5.0, mmax=87.0, lam_peak=0.04,
    mu_m=34.0, sigma_m=3.6, delta_m=4.9,
)
DEFAULT_PLPEAK_POPULATION = PLPeakPopulationParams(
    mass=DEFAULT_PLPEAK_MASS,
    redshift=RedshiftParams(lam=4.7, kappa=7.0, zp=3.0),
)


# Soft-wall slope [nats/Msun]: linear log-density ramp replacing the hard
# −∞ truncations at mmax and the q-table edge.  The density is CONTINUOUS at
# those edges (no anchor drop), so a steep ramp is safe for NUTS: 2 Msun
# past the wall costs 50 nats (spurious mass ≲ 10⁻²³ of a component).
WALL_SLOPE = 25.0

# Taper-foot floor: the exact Planck foot is doubly-exponential
# (S ~ e^{−δ/x} as x → 0⁺), so following it far down creates a tens-of-nats
# per-PE-sample log-weight staircase in the mmin direction — measured round 4
# as a −49-nat-anchored version that left mmin at ESS 9/256 with depth-10
# trees (scratch/r4_diag_plpeak.log).  Instead the exact curve is kept only
# down to log S = −8 and continued linearly at FOOT_SLOPE below: spurious
# extra mass ≈ e⁻⁸/FOOT_SLOPE ≈ 10⁻⁴ of a component (two orders under the
# ~6 % event-marginal MC noise), while the restoring gradient stays bounded
# — the same tails-are-soft geometry that lets the bump family's logistic
# turn-on sample cleanly.
# X_C: the exact root of δ/x + δ/(x−δ) = 8, i.e. where log S(x) = −softplus(8)
# ≈ −8.0003 (smaller root of 8x² − 10δx + δ² = 0).
X_C = (10.0 - math.sqrt(68.0)) / 16.0  # ≈ 0.10955
FOOT_SLOPE = 4.0


def log_planck_taper(m, mmin, delta_m):
    """log S(m): the Planck-taper turn-on — exact where S ≥ e⁻⁸, soft-floored
    below; 1 above ``mmin + delta_m``.  S = 1/(e^f + 1) with
    f = δ/x + δ/(x-δ), x = m-mmin, in the interior.

    Gradient-safe at the branch edges: the interior expression is evaluated
    at an x clamped to [X_C·δ, 0.98δ], so it never produces inf·0 NaNs in
    reverse mode.  Below X_C·δ (where the exact curve passes −8 nats) the
    curve continues as a linear ramp of slope ``FOOT_SLOPE`` — finite,
    decreasing log density instead of the doubly-exponential collapse to −∞
    (see FOOT_SLOPE above for why; the truncated curve at 0.98δ is within
    e⁻⁴⁹ of the exact taper).  At δ_m = 0 the taper degenerates to an
    8-nat soft step at ``mmin`` with the same ramp below.
    """
    m = jnp.asarray(m)
    x = m - mmin
    dm_safe = jnp.maximum(delta_m, 1e-6)
    x_lo = X_C * dm_safe
    x_in = jnp.clip(x, x_lo, 0.98 * dm_safe)
    f = jnp.clip(dm_safe / x_in + dm_safe / (x_in - dm_safe), -80.0, 80.0)
    mid = -jax.nn.softplus(f)
    below = mid - FOOT_SLOPE * jnp.maximum(x_lo - x, 0.0)
    return jnp.where(x >= dm_safe, 0.0, below)


def _log_pl_norm_inv(alpha, mmin, mmax):
    """log ∫_mmin^mmax m^{-α} dm, stable through α = 1.

    With t = 1-α and L = log(mmax/mmin):  ∫ = mmin^t · L · expm1(tL)/(tL),
    and expm1(x)/x → 1 smoothly as x → 0 (no cancellation, unlike the naive
    (mmax^t − mmin^t)/t form).
    """
    t = 1.0 - alpha
    L = jnp.log(mmax / mmin)
    x = t * L
    x_safe = jnp.where(jnp.abs(x) < 1e-12, 1.0, x)
    ratio = jnp.where(jnp.abs(x) < 1e-12, 1.0 + 0.5 * x, jnp.expm1(x_safe) / x_safe)
    return t * jnp.log(mmin) + jnp.log(L) + jnp.log(ratio)


def log_pm1_plpeak(p: PLPeakMassParams, m1):
    """log of the (un-tapered-normalized) primary-mass density:
    mixture of the truncated power law and the Gaussian peak, times the
    Planck taper.  Each mixture component is individually normalized (the
    GWTC-3 convention, so ``lam_peak`` is a real mixture weight); the taper
    and the overall pivot normalization are applied on top.
    """
    m1 = jnp.asarray(m1)
    log_pl = (
        jnp.log1p(-p.lam_peak)
        - p.alpha * jnp.log(m1)
        - _log_pl_norm_inv(p.alpha, p.mmin, p.mmax)
    )
    # soft mmax truncation of the power-law component (see WALL_SLOPE): the
    # extra component mass above mmax integrates to pdf(mmax)/WALL_SLOPE —
    # ~10⁻⁶–10⁻⁵ of the component for typical alpha (the 10⁻²³ figure in the
    # WALL_SLOPE comment is the mass *beyond 2 Msun past* the wall), orders
    # below the per-event MC noise, so the hard-truncated normalization
    # constant is kept unmodified
    log_pl = log_pl - WALL_SLOPE * jnp.maximum(m1 - p.mmax, 0.0)
    log_peak = (
        jnp.log(p.lam_peak)
        - 0.5 * jnp.square((m1 - p.mu_m) / p.sigma_m)
        - jnp.log(p.sigma_m)
        - 0.5 * math.log(2.0 * math.pi)
    )
    out = jnp.logaddexp(log_pl, log_peak) + log_planck_taper(m1, p.mmin, p.delta_m)
    # soft table-edge wall well inside M_TAB_HI so the q-norm table's
    # constant extrapolation is never consulted where density matters
    return out - WALL_SLOPE * jnp.maximum(m1 - (M_TAB_HI - 10.0), 0.0)


class PLPeakIntensity(NamedTuple):
    """Per-draw PLPeak population state: params + q-normalization table.

    A pytree (like :class:`~bumpcosmology_tpu.models.population.PopulationIntensity`);
    the generic ``log_dndmdqdv`` dispatcher calls the method below, so every
    likelihood, deterministic, and figure path that consumes an intensity
    works unchanged with this family.
    """

    params: PLPeakPopulationParams
    m_lo: jnp.ndarray  # q-norm table origin (static value M_TAB_LO, kept traced)
    dm: jnp.ndarray  # q-norm table spacing
    log_nq: jnp.ndarray  # (n_m,) log ∫ dq q^β S(q·m1) on the uniform m1 grid
    log_norm: jnp.ndarray  # pivot normalization: m·dN/dm1dqdVdt = 1 at (MREF, QREF, ZREF)

    def log_dndmdqdv(self, m1, q, z):
        """log dN/dm1/dq/dV/dt at (m1, q, z) under the pivot convention."""
        p = self.params
        m1 = jnp.asarray(m1)
        q = jnp.asarray(q)
        z = jnp.asarray(z)
        log_nq = interp_unit_spaced(m1, self.m_lo, self.dm, self.log_nq)
        return (
            log_pm1_plpeak(p.mass, m1)
            + p.mass.beta_q * jnp.log(q)
            + log_planck_taper(q * m1, p.mass.mmin, p.mass.delta_m)
            - log_nq
            + log_dndv(z, p.redshift)
            + self.log_norm
        )


def _log_nq_grid(beta_q, mmin, delta_m, n_m: int, n_q: int):
    """Tabulate log N_q(m1) = log ∫_0^1 dq q^β S(q·m1) on the uniform m1 grid.

    Shared by every mass family with the GWTC power-law-in-q pairing
    (PLPeak here, the broken power law in :mod:`models.brokenpl`): the
    pairing normalization depends only on (β_q, mmin, δ_m).

    The integrand is steep near the q ≈ mmin/m1 turn-on, so the quadrature
    runs in log q (static log-spaced nodes, trapezoid in u = log q):
    ∫ dq q^β S = ∫ du e^{(β+1)u} S(e^u·m1).

    Q_TAB_LO is part of the model definition, not a numerical shortcut:
    with the round-4 soft foot, S never reaches 0 (log S follows the
    FOOT_SLOPE ramp down to a constant ≈ −8 − FOOT_SLOPE·mmin as q → 0), so
    for β_q ≤ −1 the untruncated ∫_0 dq q^β S diverges at q = 0 and the
    floor acts as the pairing integral's hard lower bound on q.  The
    e⁻⁸-suppressed foot mass *retained* in [Q_TAB_LO, mmin/m1] is genuinely
    nonzero density; the mass *truncated* below Q_TAB_LO is bounded by
    e^{−8−FOOT_SLOPE·(mmin − Q_TAB_LO·m1)} · (Q_TAB_LO·m1/mmin)^{β_q+1} of
    N_q — at the β_q = −4 prior edge with the worst table corner
    (m1 = 200, mmin = 2) that is ≈ e^{−15.2}·10³ ≈ 3·10⁻⁴, well under the
    per-event MC noise; for β_q > −1 it is smaller still.  The SBC
    certificates fit and simulate with this same truncated normalization.
    """
    dm = (M_TAB_HI - M_TAB_LO) / (n_m - 1)
    m1 = M_TAB_LO + dm * jnp.arange(n_m)
    u = jnp.linspace(math.log(Q_TAB_LO), 0.0, n_q)
    log_integrand = (beta_q + 1.0) * u[None, :] + log_planck_taper(
        jnp.exp(u)[None, :] * m1[:, None], mmin, delta_m
    )
    # Floor the integrand at -1e4 BEFORE the log-trapezoid.  With the soft
    # foot, log_planck_taper is finite everywhere (no -inf entries in the
    # interior), so this guards only pathological underflow corners; it also
    # keeps the table finite for the matmul/tiled interp contraction
    # downstream.  Note m1 ≤ mmin rows ARE reached now — they carry the
    # finite e⁻⁸-suppressed foot density, not -inf — so the floor must stay
    # far below the foot (log S ≥ −8 − FOOT_SLOPE·mmin ≥ −48 over the prior).
    log_nq = log_trapz(jnp.maximum(log_integrand, -1e4), u[None, :], axis=1)
    return dm, log_nq


def build_plpeak_population(
    params: PLPeakPopulationParams, n_m: int = DEFAULT_N_M, n_q: int = DEFAULT_N_Q
) -> PLPeakIntensity:
    """Build the per-draw PLPeak intensity (q-norm table + pivot normalization)."""
    p = params.mass
    dm, log_nq = _log_nq_grid(p.beta_q, p.mmin, p.delta_m, n_m, n_q)
    intensity = PLPeakIntensity(
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
