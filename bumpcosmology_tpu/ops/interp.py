"""Monotone 1-D linear interpolation, forward and inverse (L0).

The reference uses ``jnp.interp`` for every table lookup: the PISN-bump mass
grid (``src/scripts/intensity_models.py:111``), the cosmology distance/volume
tables (``intensity_models.py:258-273``) and their *inverse* lookups
``z_of_dC``/``z_of_dL`` (swapped-table interpolation).  Here the same
operations are exposed as explicit primitives with

- clamped-end behaviour identical to ``jnp.interp`` (constant extrapolation),
- an inverse interpolation that assumes a strictly increasing table,
- gradients flowing through *both* the query points and the table values
  (needed because the cosmology tables depend on sampled hyperparameters).

Implementation: ``jnp.searchsorted`` + gather.  On TPU this vectorizes over
arbitrary query batches; tables are small (256-4096 points) and live in VMEM
after XLA fusion, so a bespoke Pallas kernel is only warranted for the fused
bump-grid build (see :mod:`bumpcosmology_tpu.ops.pallas`).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["interp", "interp_unit_spaced", "inverse_interp"]


def interp(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation of ``fp`` (defined at increasing points ``xp``) at ``x``.

    Semantics match ``jnp.interp``: constant extrapolation outside the table.
    ``xp``/``fp`` are 1-D; ``x`` is any shape.
    """
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    n = xp.shape[0]
    # index of the right edge of the bracketing interval, clipped to [1, n-1]
    hi = jnp.clip(jnp.searchsorted(xp, x, side="right"), 1, n - 1)
    lo = hi - 1
    x_lo = xp[lo]
    x_hi = xp[hi]
    f_lo = fp[lo]
    f_hi = fp[hi]
    denom = x_hi - x_lo
    # Guard zero-width intervals (repeated knots) without NaNs.
    t = jnp.where(denom > 0, (x - x_lo) / jnp.where(denom > 0, denom, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)  # constant extrapolation at both ends
    return f_lo + t * (f_hi - f_lo)


def interp_unit_spaced(x: jnp.ndarray, x0, dx, fp: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation on a *uniform* grid ``xp[i] = x0 + i*dx``.

    Avoids the ``searchsorted`` (log n gather chain) entirely — the bracketing
    index is computed arithmetically.  This is the hot-path lookup for the
    PISN-bump mass grid, which the model builds on a uniform grid precisely so
    that per-sample lookups are O(1) arithmetic + 2 gathers.
    """
    x = jnp.asarray(x)
    fp = jnp.asarray(fp)
    n = fp.shape[0]
    pos = (x - x0) / dx
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = jnp.clip(pos - lo.astype(pos.dtype), 0.0, 1.0)
    f_lo = fp[lo]
    f_hi = fp[lo + 1]
    return f_lo + t * (f_hi - f_lo)


def inverse_interp(y: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Inverse lookup: find ``x`` such that ``interp(x, xp, fp) = y``.

    Requires ``fp`` strictly increasing (true for the cosmology distance
    tables).  Equivalent to the reference's swapped-argument interpolation
    ``jnp.interp(dL, dlinterp, zinterp)`` (``intensity_models.py:272-273``)
    but kept as a named primitive so sharded callers and future Pallas
    implementations have a single point of truth.
    """
    return interp(y, fp, xp)
