"""Hierarchical population likelihoods (L2).

Feature-for-feature re-design of the reference's two numpyro models
(``src/scripts/intensity_models.py:313-406``):

* :func:`pop_loglike` — population-only fit at fixed Planck18 cosmology,
  source-frame data (m1, q, z).
* :func:`pop_cosmo_loglike` — joint population + flat-wCDM cosmology fit,
  detector-frame data (m1_det, q, dL), with the per-draw cosmology table and
  the (m1_det, q, dL) → (m1, q, z) change of variables inside the hot path.

Both decompose as

    log L = Σ_events [ logsumexp_samples(log w) − log nsamp ]  −  nobs·log μ_sel
    log μ_sel = logsumexp_injections(log w_sel) − log Ndraw

The per-event reduction is over the PE-sample axis; the selection reduction is
over the injection axis.  Under a mesh both axes can be sharded — see
:mod:`bumpcosmology_tpu.parallel` — because every reduction here is a
log-sum-exp with the streaming max-plus-accumulate form.

Deterministic diagnostics (``neff``, ``neff_sel``, ``R``, the three
posterior-predictive rate curves, ``hz``) are *not* computed inside the
potential — they are reconstructed post-hoc from the posterior draws by
:func:`pop_deterministics` / :func:`pop_cosmo_deterministics`, which is also
how numpyro treats ``numpyro.deterministic`` sites.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from bumpcosmology_tpu.inference.distributions import Normal, TruncatedNormal, Uniform
from bumpcosmology_tpu.inference.model import ModelSpec
from bumpcosmology_tpu.models.cosmology import (
    CosmologyTable,
    build_cosmology,
    build_detector_table,
    ddl_dz_at_z,
    dvc_and_ddl_at_z,
    dvc_dz_at_z,
    efunc,
    planck18_log_dvdz_grid,
    z_and_logjac_at_dl,
    z_at_dl,
)
from bumpcosmology_tpu.models.mass import DEFAULT_N_GRID
from bumpcosmology_tpu.models.parameters import (
    CosmoParams,
    MassParams,
    PopulationParams,
    RedshiftParams,
)
from bumpcosmology_tpu.models.population import (
    COORDS,
    QREF,
    build_population,
    log_dndmdqdv,
)
from bumpcosmology_tpu.models.mass import MREF
from bumpcosmology_tpu.models.redshift import ZREF
from bumpcosmology_tpu.ops.interp import interp_unit_spaced

__all__ = [
    "EventData",
    "SelectionData",
    "FixedCosmoGrid",
    "PopData",
    "PopCosmoData",
    "make_pop_data",
    "make_pop_cosmo_data",
    "population_from_sites",
    "cosmo_from_sites",
    "pop_loglike",
    "pop_cosmo_loglike",
    "pop_deterministics",
    "pop_cosmo_deterministics",
    "POP_PRIORS",
    "POP_COSMO_PRIORS",
    "pop_model_spec",
    "pop_cosmo_model_spec",
    "plpeak_from_sites",
    "plpeak_loglike",
    "plpeak_cosmo_loglike",
    "plpeak_deterministics",
    "plpeak_cosmo_deterministics",
    "PLPEAK_PRIORS",
    "PLPEAK_COSMO_PRIORS",
    "plpeak_model_spec",
    "plpeak_cosmo_model_spec",
]


# ---------------------------------------------------------------------------
# Data containers (pytrees)
# ---------------------------------------------------------------------------


class EventData(NamedTuple):
    """Per-event PE samples, stacked (nobs, nsamp).

    For the population-only model the columns are source-frame (m1, q, z);
    for the cosmology model they are detector-frame (m1_det, q, dL) — the
    same container is reused with ``a`` meaning m1 or m1_det and ``c``
    meaning z or dL.
    """

    a: jnp.ndarray  # (nobs, nsamp) m1 [source] or m1_det
    q: jnp.ndarray  # (nobs, nsamp)
    c: jnp.ndarray  # (nobs, nsamp) z or dL [Gpc]
    log_pdraw: jnp.ndarray  # (nobs, nsamp)


class SelectionData(NamedTuple):
    """Detected injections for the selection integral (nsel,)."""

    a: jnp.ndarray  # (nsel,) m1 or m1_det
    q: jnp.ndarray
    c: jnp.ndarray  # z or dL
    log_pdraw: jnp.ndarray
    log_ndraw: jnp.ndarray  # scalar: log of the total number of drawn injections


class FixedCosmoGrid(NamedTuple):
    """Fixed-cosmology measure log[4π dVc/dz/(1+z)] on a log1p(z)-uniform grid.

    Equivalent of the Planck18 interpolant the reference builds at trace time
    (``intensity_models.py:324-326``).  Stored in log space (the reference
    interpolates the linear table then logs; interpolating the log table is
    smoother and equally accurate at n=1024).
    """

    u0: jnp.ndarray
    du: jnp.ndarray
    log_dv: jnp.ndarray  # (n,)

    def log_dvdz_dt(self, z):
        return interp_unit_spaced(jnp.log1p(z), self.u0, self.du, self.log_dv)


class PopData(NamedTuple):
    events: EventData  # source frame (m1, q, z)
    selection: SelectionData
    planck: FixedCosmoGrid


class PopCosmoData(NamedTuple):
    events: EventData  # detector frame (m1_det, q, dL)
    selection: SelectionData


def _log_pdraw(pdraw, dtype):
    """log(pdraw) computed in float64 *before* casting.

    Importance weights can be smaller than the float32 minimum normal
    (~1e-38); casting first silently flushes them to zero and the log becomes
    -inf, which flips the corresponding log-weight to +inf and poisons the
    whole likelihood.  The log itself (~-100s) is perfectly representable.
    """
    pdraw = np.asarray(pdraw, dtype=np.float64)
    if np.any(pdraw <= 0) or not np.all(np.isfinite(pdraw)):
        raise ValueError("pdraw must be strictly positive and finite")
    return jnp.asarray(np.log(pdraw), dtype)


def make_pop_data(
    m1s, qs, zs, pdraw, m1s_sel, qs_sel, zs_sel, pdraw_sel, ndraw, dtype=jnp.float32
) -> PopData:
    """Assemble :class:`PopData` from raw arrays (cf. ``run_fit.py:22-39``)."""
    zgrid, log_dv = planck18_log_dvdz_grid()
    du = np.log1p(zgrid[-1]) / (len(zgrid) - 1)
    # Clamp the z=0 knot (-inf: zero comoving volume) to a large finite value:
    # matmul-formulated interpolation contracts zero weights against every
    # table entry, and 0 * inf = NaN would poison all lookups.  e^-200 is
    # zero weight to float32 anyway.
    finite_min = np.min(log_dv[np.isfinite(log_dv)])
    log_dv = np.where(np.isfinite(log_dv), log_dv, finite_min - 200.0)
    planck = FixedCosmoGrid(
        u0=jnp.asarray(0.0, dtype),
        du=jnp.asarray(du, dtype),
        log_dv=jnp.asarray(log_dv, dtype),
    )
    ev = EventData(
        a=jnp.asarray(m1s, dtype),
        q=jnp.asarray(qs, dtype),
        c=jnp.asarray(zs, dtype),
        log_pdraw=_log_pdraw(pdraw, dtype),
    )
    sel = SelectionData(
        a=jnp.asarray(m1s_sel, dtype),
        q=jnp.asarray(qs_sel, dtype),
        c=jnp.asarray(zs_sel, dtype),
        log_pdraw=_log_pdraw(pdraw_sel, dtype),
        log_ndraw=jnp.log(jnp.asarray(ndraw, dtype)),
    )
    return PopData(events=ev, selection=sel, planck=planck)


def make_pop_cosmo_data(
    m1s_det, qs, dls, pdraw, m1s_det_sel, qs_sel, dls_sel, pdraw_sel, ndraw, dtype=jnp.float32
) -> PopCosmoData:
    """Assemble :class:`PopCosmoData` (cf. ``run_cosmo_fit.py:21-49``)."""
    ev = EventData(
        a=jnp.asarray(m1s_det, dtype),
        q=jnp.asarray(qs, dtype),
        c=jnp.asarray(dls, dtype),
        log_pdraw=_log_pdraw(pdraw, dtype),
    )
    sel = SelectionData(
        a=jnp.asarray(m1s_det_sel, dtype),
        q=jnp.asarray(qs_sel, dtype),
        c=jnp.asarray(dls_sel, dtype),
        log_pdraw=_log_pdraw(pdraw_sel, dtype),
        log_ndraw=jnp.log(jnp.asarray(ndraw, dtype)),
    )
    return PopCosmoData(events=ev, selection=sel)


# ---------------------------------------------------------------------------
# Site dict -> model parameter pytrees
# ---------------------------------------------------------------------------


def population_from_sites(sites: Dict[str, jnp.ndarray]) -> PopulationParams:
    """Reparameterizations shared by both models (``intensity_models.py:288,294,301``):

    mbhmax = mpisn + dmbhmax,  fpl = exp(log_fpl),  kappa = lam + dkappa.
    """
    mass = MassParams(
        a=sites["a"],
        b=sites["b"],
        c=sites["c"],
        mpisn=sites["mpisn"],
        mbhmax=sites["mpisn"] + sites["dmbhmax"],
        sigma=sites["sigma"],
        fpl=jnp.exp(sites["log_fpl"]),
        beta=sites["beta"],
    )
    redshift = RedshiftParams(
        lam=sites["lam"], kappa=sites["lam"] + sites["dkappa"], zp=sites["zp"]
    )
    return PopulationParams(mass=mass, redshift=redshift)


def cosmo_from_sites(sites: Dict[str, jnp.ndarray]) -> CosmoParams:
    return CosmoParams(h=sites["h"], Om=sites["Om"], w=sites["w"])


# ---------------------------------------------------------------------------
# Log-likelihoods
# ---------------------------------------------------------------------------


def _selection_neff_terms(log_sel_wts: jnp.ndarray, log_ndraw: jnp.ndarray):
    """(log_mu_sel, neff_sel) — selection mean and its effective sample size.

    Implements the variance diagnostic of Farr (2019) exactly as the
    reference does (``intensity_models.py:338-344``), with an f32-safe clamp
    on the ``log1p(-exp(·))`` argument.
    """
    log_mu = logsumexp(log_sel_wts) - log_ndraw
    log_mu2 = logsumexp(2.0 * log_sel_wts) - 2.0 * log_ndraw
    x = 2.0 * log_mu - log_ndraw - log_mu2
    x = jnp.minimum(x, -1e-7)  # guard: mathematically x<0; f32 rounding can cross
    log_s2 = log_mu2 + jnp.log1p(-jnp.exp(x))
    neff_sel = jnp.exp(2.0 * log_mu - log_s2)
    return log_mu, neff_sel


def _pop_event_sel_logwts(sites, data: PopData, n_grid: int, build=None):
    build = build or (lambda s, n: build_population(population_from_sites(s), n))
    pop = build(sites, n_grid)
    ev, sel = data.events, data.selection
    log_wts = (
        log_dndmdqdv(pop, ev.a, ev.q, ev.c)
        + data.planck.log_dvdz_dt(ev.c)
        - ev.log_pdraw
    )
    log_sel_wts = (
        log_dndmdqdv(pop, sel.a, sel.q, sel.c)
        + data.planck.log_dvdz_dt(sel.c)
        - sel.log_pdraw
    )
    return pop, log_wts, log_sel_wts


def pop_loglike(
    sites: Dict[str, jnp.ndarray], data: PopData, n_grid: int = DEFAULT_N_GRID, build=None
):
    """Population-only log-likelihood (``pop_model``, ``intensity_models.py:313-340``).

    ``build`` (sites, n_grid) → intensity selects the mass-model family;
    ``None`` = the PISN-bump family.
    """
    ev = data.events
    nobs, nsamp = ev.a.shape
    _, log_wts, log_sel_wts = _pop_event_sel_logwts(sites, data, n_grid, build)
    log_like = logsumexp(log_wts, axis=1) - math.log(nsamp)
    log_mu_sel = logsumexp(log_sel_wts) - data.selection.log_ndraw
    return jnp.sum(log_like) - nobs * log_mu_sel


def _cosmo_frame_logwts(pop, cosmo: CosmologyTable, a, q, dl, log_pdraw):
    """Detector-frame weight: population intensity × full Jacobian.

    z = z(dL); m1 = m1_det/(1+z); weight multiplies
    −2·log1p(z) + log dVc/dz − log ddL/dz  (``intensity_models.py:378-388``).
    """
    z = z_at_dl(cosmo, dl)
    m1 = a / (1.0 + z)
    dvc, ddl = dvc_and_ddl_at_z(cosmo, z)
    return (
        log_dndmdqdv(pop, m1, q, z)
        - 2.0 * jnp.log1p(z)
        + jnp.log(dvc)
        - jnp.log(ddl)
        - log_pdraw
    )


_LOGWTS_IMPL_OVERRIDE = None  # None = XLA everywhere; "pallas" | "xla"


def set_logwts_impl(mode) -> None:
    """Force the fused detector-frame log-weight implementation: ``"pallas"``
    (single VMEM-resident kernel, :mod:`bumpcosmology_tpu.ops.pallas_logwts`),
    ``"xla"`` (tiled-contraction jnp path), or ``None`` (the default — XLA;
    measured on v5e the XLA fusion keeps parity, see README)."""
    global _LOGWTS_IMPL_OVERRIDE
    assert mode in (None, "pallas", "xla")
    _LOGWTS_IMPL_OVERRIDE = mode


def _cosmo_frame_logwts_fused(pop, det, a, q, dl, log_pdraw):
    """Detector-frame weight via the log(dL)-keyed :class:`DetectorFrameTable`.

    Same mathematics as :func:`_cosmo_frame_logwts` (z lookup + full frame
    Jacobian) but all cosmology-dependent per-sample quantities come from ONE
    two-column tiled contraction whose bracket weights depend only on the
    (constant) data — the HBM-traffic fix for the flagship hot loop.  With
    ``set_logwts_impl("pallas")`` the whole chain instead runs inside one
    Pallas kernel (value+VJP parity pinned by ``tests/test_pallas_logwts.py``).
    """
    from bumpcosmology_tpu.models.population import PopulationIntensity

    if _LOGWTS_IMPL_OVERRIDE == "pallas" and isinstance(pop, PopulationIntensity):
        # The fused kernel hard-codes the bump family's table layout; other
        # intensity families always take the XLA path.
        from bumpcosmology_tpu.ops.pallas_logwts import cosmo_frame_logwts_pallas

        return cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw)
    z, log_jac = z_and_logjac_at_dl(det, dl)
    m1 = a / (1.0 + z)
    return (
        log_dndmdqdv(pop, m1, q, z) - 2.0 * jnp.log1p(z) + log_jac - log_pdraw
    )


def _cosmo_frame_logwts_bracket(pop, det, onehot, frac, a, q, log_pdraw):
    """Detector-frame weight with *precomputed constant* interp brackets.

    Same mathematics as :func:`_cosmo_frame_logwts_fused`, but the bracket
    selection against the log(dL)-keyed detector table is a data constant
    (queries are the observed dL, the grid is static), precomputed once by
    :func:`~bumpcosmology_tpu.ops.interp.static_bracket_weights`.  The
    per-eval cosmology fetch collapses to one (N, K-1) @ (K-1, 4) matmul —
    the round-5 roofline fix (the tiled fetch was 63% of the 64-chain
    value+grad and left the chip at 92% of HBM-bandwidth peak).
    """
    from bumpcosmology_tpu.ops.interp import fetch_static_bracket

    zj = fetch_static_bracket(onehot, frac, det.cols)  # (N, 2)
    shape = a.shape
    z = zj[:, 0].reshape(shape)
    log_jac = zj[:, 1].reshape(shape)
    m1 = a / (1.0 + z)
    return (
        log_dndmdqdv(pop, m1, q, z) - 2.0 * jnp.log1p(z) + log_jac - log_pdraw
    )


_BRACKET_CACHE: Dict[tuple, tuple] = {}
_BRACKET_OVERRIDE = None  # None = by backend (TPU only); True/False force


def set_bracket_fetch(mode) -> None:
    """Force the static-bracket detector fetch on/off (``None`` = by backend).

    The bracket fetch replaces per-eval tiled lookups with one constant-LHS
    matmul — a bandwidth win on the TPU MXU, but a *slowdown* on CPU, where
    the gather formulation is already O(1)/query.  The default therefore
    enables it only on the TPU backend; tests use the override to exercise
    the bracket path on the CPU mesh.
    """
    global _BRACKET_OVERRIDE
    assert mode in (None, True, False)
    _BRACKET_OVERRIDE = mode


def _brackets_enabled() -> bool:
    if _BRACKET_OVERRIDE is not None:
        return _BRACKET_OVERRIDE
    return jax.default_backend() in ("tpu", "axon")


def _frame_brackets(ev_c, sel_c, dl_bounds, n_det: int):
    """Constant interp brackets for the event/selection dL queries, or ``None``.

    Returns ``((ev_onehot, ev_frac), (sel_onehot, sel_frac))`` numpy constants
    when the dL arrays are concrete (the normal dense fit path), or ``None``
    when they are tracers (e.g. an SBC fleet vmapped over catalogs) — callers
    then fall back to the per-eval tiled fetch.  Cached per (array identity,
    bounds, n_det): the weight matrices are O(N·n_det) and rebuilt only when
    a new catalog/spec is built, not per trace.
    """
    from bumpcosmology_tpu.ops.interp import static_bracket_weights

    if not _brackets_enabled():
        return None
    if isinstance(ev_c, jax.core.Tracer) or isinstance(sel_c, jax.core.Tracer):
        return None
    key = (id(ev_c), id(sel_c), dl_bounds, n_det)
    hit = _BRACKET_CACHE.get(key)
    if hit is not None:
        return hit
    v0 = math.log(dl_bounds[0])
    v1 = math.log(dl_bounds[1])
    dv = (v1 - v0) / (n_det - 1)
    ev_br = static_bracket_weights(np.log(np.asarray(ev_c, np.float64)), v0, dv, n_det)
    sel_br = static_bracket_weights(np.log(np.asarray(sel_c, np.float64)), v0, dv, n_det)
    if len(_BRACKET_CACHE) > 8:  # a handful of specs live at once, at most
        _BRACKET_CACHE.clear()
    _BRACKET_CACHE[key] = (ev_br, sel_br)
    return ev_br, sel_br


def dl_bounds_of(data: PopCosmoData, margin: float = 0.05):
    """Static (dl_lo, dl_hi) floats bracketing every event/selection dL —
    the detector-table keying range (computed once at spec build)."""
    lo = min(float(jnp.min(data.events.c)), float(jnp.min(data.selection.c)))
    hi = max(float(jnp.max(data.events.c)), float(jnp.max(data.selection.c)))
    return lo * (1.0 - margin), hi * (1.0 + margin)


def _pop_cosmo_event_sel_logwts(
    sites, data: PopCosmoData, n_grid: int, n_z: int, dl_bounds=None, build=None,
    n_det=None,
):
    build = build or (lambda s, n: build_population(population_from_sites(s), n))
    pop = build(sites, n_grid)
    cosmo = build_cosmology(cosmo_from_sites(sites), n=n_z)
    ev, sel = data.events, data.selection
    if dl_bounds is not None:
        brackets = None
        if _LOGWTS_IMPL_OVERRIDE != "pallas":
            brackets = _frame_brackets(ev.c, sel.c, dl_bounds, n_det or n_z)
        if brackets is not None:
            det = build_detector_table(cosmo, dl_bounds[0], dl_bounds[1], n=n_det or n_z)
            (ev_oh, ev_fr), (sel_oh, sel_fr) = brackets
            log_wts = _cosmo_frame_logwts_bracket(
                pop, det, ev_oh, ev_fr, ev.a, ev.q, ev.log_pdraw
            )
            log_sel_wts = _cosmo_frame_logwts_bracket(
                pop, det, sel_oh, sel_fr, sel.a, sel.q, sel.log_pdraw
            )
            return pop, cosmo, log_wts, log_sel_wts
        det = build_detector_table(cosmo, dl_bounds[0], dl_bounds[1], n=n_z)
        log_wts = _cosmo_frame_logwts_fused(pop, det, ev.a, ev.q, ev.c, ev.log_pdraw)
        log_sel_wts = _cosmo_frame_logwts_fused(
            pop, det, sel.a, sel.q, sel.c, sel.log_pdraw
        )
    else:
        log_wts = _cosmo_frame_logwts(pop, cosmo, ev.a, ev.q, ev.c, ev.log_pdraw)
        log_sel_wts = _cosmo_frame_logwts(pop, cosmo, sel.a, sel.q, sel.c, sel.log_pdraw)
    return pop, cosmo, log_wts, log_sel_wts


def pop_cosmo_loglike(
    sites: Dict[str, jnp.ndarray],
    data: PopCosmoData,
    n_grid: int = DEFAULT_N_GRID,
    n_z: int = 1024,
    dl_bounds=None,
    build=None,
    n_det=None,
):
    """Joint population+cosmology log-likelihood (``pop_cosmo_model``,
    ``intensity_models.py:357-390``).

    With ``dl_bounds`` (static floats) the cosmology lookups route through
    the fused detector-frame table — numerically equivalent (same linear
    interpolation resolution, re-keyed grid) and ~2x faster on TPU.  When the
    dL arrays are concrete the bracket weights are additionally precomputed
    as data constants (:func:`_frame_brackets`), with ``n_det`` overriding
    the detector-table resolution (default: ``n_z``).
    ``build`` selects the mass-model family (``None`` = PISN bump).
    """
    ev = data.events
    nobs, nsamp = ev.a.shape
    _, _, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(
        sites, data, n_grid, n_z, dl_bounds, build, n_det
    )
    log_like = logsumexp(log_wts, axis=1) - math.log(nsamp)
    log_mu_sel = logsumexp(log_sel_wts) - data.selection.log_ndraw
    return jnp.sum(log_like) - nobs * log_mu_sel


# ---------------------------------------------------------------------------
# Deterministic sites (posterior post-processing)
# ---------------------------------------------------------------------------


def _shared_deterministics(sites, pop, log_wts, log_sel_wts, log_ndraw, nobs):
    log_mu_sel, neff_sel = _selection_neff_terms(log_sel_wts, log_ndraw)
    mu_sel = jnp.exp(log_mu_sel)
    # Rate via the unit-normal reparameterization (``intensity_models.py:348-349``)
    R = nobs / mu_sel + jnp.sqrt(jnp.asarray(nobs, dtype=mu_sel.dtype)) / mu_sel * sites["R_unit"]
    neff = jnp.exp(2.0 * logsumexp(log_wts, axis=1) - logsumexp(2.0 * log_wts, axis=1))

    m_grid = jnp.asarray(COORDS["m_grid"], dtype=log_wts.dtype)
    q_grid = jnp.asarray(COORDS["q_grid"], dtype=log_wts.dtype)
    z_grid = jnp.asarray(COORDS["z_grid"], dtype=log_wts.dtype)
    out = {
        "kappa": pop.params.redshift.kappa,
        "neff_sel": neff_sel,
        # MC noise of the -nobs log mu_sel term in nats: above ~1 the
        # selection integral's smooth parameter-dependent noise carves
        # pseudo-modes into the posterior (docs/DESIGN.md §5a) — add
        # injections rather than trusting the fit.
        "selection_noise_nats": nobs / jnp.sqrt(neff_sel),
        "neff": neff,
        "R": R,
        # exp clamped at 80 nats: prior-extreme draws of q-normalized
        # families (e.g. PLPeak with beta_q ~ 6, m1 just above mmin) have
        # genuinely huge conditional densities that overflow float32; the
        # clamp (e^80 ~ 5e34) only touches such figure-irrelevant corners.
        "mdNdmdVdt_fixed_qz": m_grid * R * jnp.exp(jnp.minimum(log_dndmdqdv(pop, m_grid, QREF, ZREF), 80.0)),
        "dNdqdVdt_fixed_mz": MREF * R * jnp.exp(jnp.minimum(log_dndmdqdv(pop, MREF, q_grid, ZREF), 80.0)),
        "dNdVdt_fixed_mq": MREF * R * jnp.exp(jnp.minimum(log_dndmdqdv(pop, MREF, QREF, z_grid), 80.0)),
    }
    return out


def _bump_extras(pop):
    """Bump-family reparameterized deterministics (``intensity_models.py:288,294``)."""
    return {"mbhmax": pop.params.mass.mbhmax, "fpl": pop.params.mass.fpl}


def pop_deterministics(sites: Dict[str, jnp.ndarray], data: PopData, n_grid: int = DEFAULT_N_GRID):
    """All deterministic trace sites of ``pop_model`` (``intensity_models.py:342-355``)."""
    nobs = data.events.a.shape[0]
    pop, log_wts, log_sel_wts = _pop_event_sel_logwts(sites, data, n_grid)
    out = _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)
    out.update(_bump_extras(pop))
    return out


def pop_cosmo_deterministics(
    sites: Dict[str, jnp.ndarray], data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024
):
    """All deterministic trace sites of ``pop_cosmo_model`` (``intensity_models.py:392-406``)."""
    nobs = data.events.a.shape[0]
    pop, cosmo, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(sites, data, n_grid, n_z)
    out = _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)
    out.update(_bump_extras(pop))
    z_grid = jnp.asarray(COORDS["z_grid"], dtype=log_wts.dtype)
    out["hz"] = cosmo.params.h * efunc(z_grid, cosmo.params)
    return out


# ---------------------------------------------------------------------------
# POWER-LAW+PEAK family (models/plpeak.py) — same likelihood skeleton, second
# mass-model family.  No reference counterpart (the reference fits only its
# physical bump model); priors follow the GWTC-3 fiducial analysis ranges.
# ---------------------------------------------------------------------------


def plpeak_from_sites(sites: Dict[str, jnp.ndarray]):
    """Site dict → :class:`~bumpcosmology_tpu.models.plpeak.PLPeakPopulationParams`.

    All mass sites are direct (no reparameterizations); the redshift block
    shares the bump family's ``kappa = lam + dkappa`` reparam so the two
    families' rate-evolution posteriors are directly comparable.
    """
    from bumpcosmology_tpu.models.plpeak import PLPeakMassParams, PLPeakPopulationParams

    mass = PLPeakMassParams(
        alpha=sites["alpha"],
        beta_q=sites["beta_q"],
        mmin=sites["mmin"],
        mmax=sites["mmax"],
        lam_peak=sites["lam_peak"],
        mu_m=sites["mu_m"],
        sigma_m=sites["sigma_m"],
        delta_m=sites["delta_m"],
    )
    redshift = RedshiftParams(
        lam=sites["lam"], kappa=sites["lam"] + sites["dkappa"], zp=sites["zp"]
    )
    return PLPeakPopulationParams(mass=mass, redshift=redshift)


def _build_plpeak(sites, n_grid):
    from bumpcosmology_tpu.models.plpeak import build_plpeak_population

    return build_plpeak_population(plpeak_from_sites(sites), n_m=n_grid)


def plpeak_loglike(sites, data: PopData, n_grid: int = DEFAULT_N_GRID):
    """Population-only log-likelihood under the POWER-LAW+PEAK family."""
    return pop_loglike(sites, data, n_grid, build=_build_plpeak)


def plpeak_cosmo_loglike(
    sites, data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024,
    dl_bounds=None, n_det=None,
):
    """Joint population+cosmology log-likelihood under POWER-LAW+PEAK."""
    return pop_cosmo_loglike(
        sites, data, n_grid, n_z, dl_bounds, build=_build_plpeak, n_det=n_det
    )


def plpeak_deterministics(sites, data: PopData, n_grid: int = DEFAULT_N_GRID):
    """Deterministic trace sites for the PLPeak population-only fit — the
    generic set (kappa, neff, neff_sel, selection noise, R, rate curves)."""
    nobs = data.events.a.shape[0]
    pop, log_wts, log_sel_wts = _pop_event_sel_logwts(sites, data, n_grid, _build_plpeak)
    return _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)


def plpeak_cosmo_deterministics(
    sites, data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024
):
    """Deterministic trace sites for the PLPeak joint fit (generic set + hz)."""
    nobs = data.events.a.shape[0]
    pop, cosmo, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(
        sites, data, n_grid, n_z, build=_build_plpeak
    )
    out = _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)
    z_grid = jnp.asarray(COORDS["z_grid"], dtype=log_wts.dtype)
    out["hz"] = cosmo.params.h * efunc(z_grid, cosmo.params)
    return out


# ---------------------------------------------------------------------------
# Hyperpriors (``intensity_models.py:281-311``) and model specs
# ---------------------------------------------------------------------------

_MASS_PRIORS = {
    "a": TruncatedNormal(2.35, 2.0, low=-1.65, high=6.35),
    "b": TruncatedNormal(1.9, 2.0, low=-2.1, high=5.9),
    "c": TruncatedNormal(4.0, 2.0, low=0.0, high=8.0),
    "mpisn": TruncatedNormal(35.0, 5.0, low=20.0, high=50.0),
    "dmbhmax": TruncatedNormal(5.0, 2.0, low=0.5, high=11.0),
    "sigma": TruncatedNormal(2.0, 2.0, low=1.0),
    "beta": Normal(0.0, 2.0),
    "log_fpl": Uniform(math.log(1e-3), math.log(0.5)),
}

_REDSHIFT_PRIORS = {
    "lam": TruncatedNormal(2.7, 2.0, low=-1.3, high=6.7),
    "dkappa": TruncatedNormal(5.6 - 2.7, 2.0, low=1.0, high=9.6 - 2.7),
    "zp": TruncatedNormal(1.9, 1.0, low=0.0, high=3.9),
}

_COSMO_PRIORS = {
    "h": TruncatedNormal(0.7, 0.2, low=0.35, high=1.4),
    "Om": TruncatedNormal(0.3, 0.15, low=0.0, high=1.0),
    "w": TruncatedNormal(-1.0, 0.25, low=-1.5, high=-0.5),
}

_RATE_PRIORS = {"R_unit": Normal(0.0, 1.0)}

POP_PRIORS = {**_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS}
POP_COSMO_PRIORS = {**_COSMO_PRIORS, **_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS}

# POWER-LAW+PEAK hyperpriors: the GWTC-3 fiducial analysis ranges (LVK
# population paper, Table VI of the appendix-B model definitions).
_PLPEAK_MASS_PRIORS = {
    "alpha": Uniform(-4.0, 12.0),
    "beta_q": Uniform(-4.0, 12.0),
    "mmin": Uniform(2.0, 10.0),
    "mmax": Uniform(30.0, 100.0),
    "lam_peak": Uniform(0.0, 1.0),
    "mu_m": Uniform(20.0, 50.0),
    "sigma_m": Uniform(1.0, 10.0),
    "delta_m": Uniform(0.0, 10.0),
}

PLPEAK_PRIORS = {**_PLPEAK_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS}
PLPEAK_COSMO_PRIORS = {
    **_COSMO_PRIORS, **_PLPEAK_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS
}


def pop_model_spec(data: PopData, n_grid: int = DEFAULT_N_GRID) -> ModelSpec:
    """The population-only model as a :class:`ModelSpec` (12 sites)."""
    return ModelSpec(
        priors=dict(POP_PRIORS),
        loglike=lambda sites: pop_loglike(sites, data, n_grid),
    )


def pop_cosmo_model_spec(
    data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024, n_det=256
) -> ModelSpec:
    """The joint population+cosmology model as a :class:`ModelSpec` (15 sites).

    The catalog's dL range is captured here as static bounds so the hot loop
    can use the fused detector-frame table (see :func:`pop_cosmo_loglike`);
    ``n_det`` sets the detector-table resolution (``None`` = ``n_z``).
    Default 256: the detector-grid truncation is unmeasurable against the
    shared n_z=1024 cosmology-table truncation (f64 study vs an 8192-pt
    oracle: max |dU| 0.1013/0.1013/0.1015 nats at n_det 256/512/1024 —
    identical to 3 decimal places; ``scratch/r5_ndet_budget.py``), and the
    bracket matmul cost scales linearly with n_det.
    """
    bounds = dl_bounds_of(data)
    return ModelSpec(
        priors=dict(POP_COSMO_PRIORS),
        loglike=lambda sites: pop_cosmo_loglike(sites, data, n_grid, n_z, bounds, n_det=n_det),
    )


def plpeak_model_spec(data: PopData, n_grid: int = DEFAULT_N_GRID) -> ModelSpec:
    """The POWER-LAW+PEAK population-only model as a :class:`ModelSpec` (12 sites)."""
    return ModelSpec(
        priors=dict(PLPEAK_PRIORS),
        loglike=lambda sites: plpeak_loglike(sites, data, n_grid),
    )


def plpeak_cosmo_model_spec(
    data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024, n_det=256
) -> ModelSpec:
    """The joint POWER-LAW+PEAK + flat-wCDM model as a :class:`ModelSpec` (15 sites).

    ``n_det``: see :func:`pop_cosmo_model_spec`."""
    bounds = dl_bounds_of(data)
    return ModelSpec(
        priors=dict(PLPEAK_COSMO_PRIORS),
        loglike=lambda sites: plpeak_cosmo_loglike(
            sites, data, n_grid, n_z, bounds, n_det=n_det
        ),
    )


# ---------------------------------------------------------------------------
# BROKEN POWER LAW family (third mass family; ``models/brokenpl.py``)
# ---------------------------------------------------------------------------


def brokenpl_from_sites(sites: Dict[str, jnp.ndarray]):
    """Site dict → :class:`~bumpcosmology_tpu.models.brokenpl.BrokenPLPopulationParams`.

    Mass sites are direct; the redshift block shares the ``kappa = lam +
    dkappa`` reparam with the other two families.
    """
    from bumpcosmology_tpu.models.brokenpl import (
        BrokenPLMassParams,
        BrokenPLPopulationParams,
    )

    mass = BrokenPLMassParams(
        alpha1=sites["alpha1"],
        alpha2=sites["alpha2"],
        bfrac=sites["bfrac"],
        beta_q=sites["beta_q"],
        mmin=sites["mmin"],
        mmax=sites["mmax"],
        delta_m=sites["delta_m"],
    )
    redshift = RedshiftParams(
        lam=sites["lam"], kappa=sites["lam"] + sites["dkappa"], zp=sites["zp"]
    )
    return BrokenPLPopulationParams(mass=mass, redshift=redshift)


def _build_brokenpl(sites, n_grid):
    from bumpcosmology_tpu.models.brokenpl import build_brokenpl_population

    return build_brokenpl_population(brokenpl_from_sites(sites), n_m=n_grid)


def brokenpl_loglike(sites, data: PopData, n_grid: int = DEFAULT_N_GRID):
    """Population-only log-likelihood under the BROKEN POWER LAW family."""
    return pop_loglike(sites, data, n_grid, build=_build_brokenpl)


def brokenpl_cosmo_loglike(
    sites, data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024,
    dl_bounds=None, n_det=None,
):
    """Joint population+cosmology log-likelihood under BROKEN POWER LAW."""
    return pop_cosmo_loglike(
        sites, data, n_grid, n_z, dl_bounds, build=_build_brokenpl, n_det=n_det
    )


def brokenpl_deterministics(sites, data: PopData, n_grid: int = DEFAULT_N_GRID):
    """Deterministic trace sites for the BrokenPL population-only fit."""
    nobs = data.events.a.shape[0]
    pop, log_wts, log_sel_wts = _pop_event_sel_logwts(sites, data, n_grid, _build_brokenpl)
    return _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)


def brokenpl_cosmo_deterministics(
    sites, data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024
):
    """Deterministic trace sites for the BrokenPL joint fit (generic set + hz)."""
    nobs = data.events.a.shape[0]
    pop, cosmo, log_wts, log_sel_wts = _pop_cosmo_event_sel_logwts(
        sites, data, n_grid, n_z, build=_build_brokenpl
    )
    out = _shared_deterministics(sites, pop, log_wts, log_sel_wts, data.selection.log_ndraw, nobs)
    z_grid = jnp.asarray(COORDS["z_grid"], dtype=log_wts.dtype)
    out["hz"] = cosmo.params.h * efunc(z_grid, cosmo.params)
    return out


# BROKEN POWER LAW hyperpriors: the LVK appendix-B analysis ranges.
_BROKENPL_MASS_PRIORS = {
    "alpha1": Uniform(-4.0, 12.0),
    "alpha2": Uniform(-4.0, 12.0),
    "bfrac": Uniform(0.0, 1.0),
    "beta_q": Uniform(-4.0, 12.0),
    "mmin": Uniform(2.0, 10.0),
    "mmax": Uniform(50.0, 200.0),
    "delta_m": Uniform(0.0, 10.0),
}

BROKENPL_PRIORS = {**_BROKENPL_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS}
BROKENPL_COSMO_PRIORS = {
    **_COSMO_PRIORS, **_BROKENPL_MASS_PRIORS, **_REDSHIFT_PRIORS, **_RATE_PRIORS
}


def brokenpl_model_spec(data: PopData, n_grid: int = DEFAULT_N_GRID) -> ModelSpec:
    """The BROKEN POWER LAW population-only model as a :class:`ModelSpec` (11 sites)."""
    return ModelSpec(
        priors=dict(BROKENPL_PRIORS),
        loglike=lambda sites: brokenpl_loglike(sites, data, n_grid),
    )


def brokenpl_cosmo_model_spec(
    data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024, n_det=256
) -> ModelSpec:
    """The joint BROKEN POWER LAW + flat-wCDM model as a :class:`ModelSpec` (14 sites).

    ``n_det``: see :func:`pop_cosmo_model_spec`."""
    bounds = dl_bounds_of(data)
    return ModelSpec(
        priors=dict(BROKENPL_COSMO_PRIORS),
        loglike=lambda sites: brokenpl_cosmo_loglike(
            sites, data, n_grid, n_z, bounds, n_det=n_det
        ),
    )


# ---------------------------------------------------------------------------
# Mass-family registry — one row per family; stages/compare/ppc dispatch here
# ---------------------------------------------------------------------------


class MassFamily(NamedTuple):
    """Everything the pipeline needs to fit/compare one mass-model family.

    ``build`` is the per-draw intensity constructor passed through the
    generic likelihood plumbing (``None`` selects the default PISN-bump
    path); ``trace_name``/``cosmo_trace_name`` are the artifact filenames
    (the bump family keeps the reference's unsuffixed names,
    ``run_fit.py:42`` / ``run_cosmo_fit.py:53``).
    """

    build: object  # Optional[(sites, n_grid) -> intensity]
    pop_priors: Dict[str, object]
    cosmo_priors: Dict[str, object]
    pop_spec: object
    cosmo_spec: object
    pop_det: object
    cosmo_det: object
    trace_name: str
    cosmo_trace_name: str


MASS_FAMILIES: Dict[str, MassFamily] = {
    "bump": MassFamily(
        build=None,
        pop_priors=POP_PRIORS,
        cosmo_priors=POP_COSMO_PRIORS,
        pop_spec=pop_model_spec,
        cosmo_spec=pop_cosmo_model_spec,
        pop_det=pop_deterministics,
        cosmo_det=pop_cosmo_deterministics,
        trace_name="trace.h5",
        cosmo_trace_name="trace_cosmo.h5",
    ),
    "plpeak": MassFamily(
        build=_build_plpeak,
        pop_priors=PLPEAK_PRIORS,
        cosmo_priors=PLPEAK_COSMO_PRIORS,
        pop_spec=plpeak_model_spec,
        cosmo_spec=plpeak_cosmo_model_spec,
        pop_det=plpeak_deterministics,
        cosmo_det=plpeak_cosmo_deterministics,
        trace_name="trace_plpeak.h5",
        cosmo_trace_name="trace_cosmo_plpeak.h5",
    ),
    "brokenpl": MassFamily(
        build=_build_brokenpl,
        pop_priors=BROKENPL_PRIORS,
        cosmo_priors=BROKENPL_COSMO_PRIORS,
        pop_spec=brokenpl_model_spec,
        cosmo_spec=brokenpl_cosmo_model_spec,
        pop_det=brokenpl_deterministics,
        cosmo_det=brokenpl_cosmo_deterministics,
        trace_name="trace_brokenpl.h5",
        cosmo_trace_name="trace_cosmo_brokenpl.h5",
    ),
}
