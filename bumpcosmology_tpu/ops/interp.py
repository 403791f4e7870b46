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

On TPU, dynamic gathers from *traced* tables lower to slow serial loops
(measured ~56 ns/query on v5e — they dominate the whole likelihood).  The
TPU-native formulation used here instead turns interpolation into MXU work:
the bracketing interval is selected with a 0/1 (or hat-function) weight
matrix contracted against the table — a (N, K) matmul with no gathers at
all.  Both formulations are exposed; the default picks by backend
(``matmul`` on TPU, ``gather`` elsewhere) and tests assert they agree.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "interp",
    "interp_unit_spaced",
    "interp_unit_tiled",
    "inverse_interp",
    "static_bracket_weights",
    "fetch_static_bracket",
]


_METHOD_OVERRIDE: Optional[str] = None


def set_default_method(method: Optional[str]) -> None:
    """Force the interpolation formulation globally (None = by backend).

    Needed when placing computation on a non-default backend (e.g. CPU
    baselines in a TPU-default process): the per-call default keys off
    ``jax.default_backend()``, which reflects the process default, not the
    device an array lives on.
    """
    global _METHOD_OVERRIDE
    assert method in (None, "gather", "matmul", "tiled")
    _METHOD_OVERRIDE = method


def _default_method() -> str:
    if _METHOD_OVERRIDE is not None:
        return _METHOD_OVERRIDE
    return "matmul" if jax.default_backend() == "tpu" else "gather"


def _default_unit_method() -> str:
    """Uniform-grid lookups default to the tiled two-level formulation on TPU
    (exact linear interp, ~16x less HBM traffic than the flat hat matmul).

    Only the *backend-derived* default is upgraded: an explicit
    ``set_default_method("matmul")`` override is honored literally.
    """
    if _METHOD_OVERRIDE is not None:
        return _METHOD_OVERRIDE
    return "tiled" if jax.default_backend() == "tpu" else "gather"


# ---------------------------------------------------------------- non-uniform


def _interp_gather(x, xp, fp):
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


def _interp_matmul(x, xp, fp):
    """Gather-free bracket selection: a 0/1 (N, K-1) segment-membership matrix
    contracted against the stacked segment endpoints (one MXU matmul)."""
    shape = x.shape
    xq = jnp.clip(x.reshape(-1), xp[0], xp[-1])
    ge = xq[:, None] >= xp[None, :-1]
    lt = xq[:, None] < xp[None, 1:]
    onehot = (ge & lt).astype(xq.dtype)
    # x == xp[-1] falls in no half-open segment; assign it to the last one
    onehot = onehot.at[:, -1].set(
        jnp.where(xq >= xp[-1], 1.0, onehot[:, -1])
    )
    cols = jnp.stack([xp[:-1], xp[1:], fp[:-1], fp[1:]], axis=1)  # (K-1, 4)
    # HIGHEST: the TPU MXU's default f32 dot is a single bf16 pass (~8
    # mantissa bits) — selection through a 0/1 matrix must not round the
    # table values (measured ±2^-9 relative on v5e, scratch/r5_roofline.py).
    vals = jnp.dot(
        onehot, cols, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=xq.dtype,
    )
    x_lo, x_hi, f_lo, f_hi = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
    denom = x_hi - x_lo
    t = jnp.where(denom > 0, (xq - x_lo) / jnp.where(denom > 0, denom, 1.0), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    return (f_lo + t * (f_hi - f_lo)).reshape(shape)


def interp(
    x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray, method: Optional[str] = None
) -> jnp.ndarray:
    """Linear interpolation of ``fp`` (defined at increasing points ``xp``) at ``x``.

    Semantics match ``jnp.interp``: constant extrapolation outside the table.
    ``xp``/``fp`` are 1-D; ``x`` is any shape.  ``method`` is ``"gather"``
    (searchsorted + dynamic gathers) or ``"matmul"`` (MXU bracket selection);
    default picks by backend.
    """
    x = jnp.asarray(x)
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    method = method or _default_method()
    if method in ("matmul", "tiled"):
        # 'tiled' exists only for uniform grids; its non-uniform spelling is
        # the segment-membership matmul (same MXU formulation class)
        return _interp_matmul(x, xp, fp)
    return _interp_gather(x, xp, fp)


# -------------------------------------------------------------------- uniform


def _interp_unit_gather(x, x0, dx, fp):
    n = fp.shape[0]
    pos = (x - x0) / dx
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    t = jnp.clip(pos - lo.astype(pos.dtype), 0.0, 1.0)
    f_lo = fp[lo]
    f_hi = fp[lo + 1]
    if fp.ndim == 2:  # (K, C) tables: broadcast the weight over columns
        t = t[..., None]
    return f_lo + t * (f_hi - f_lo)


def _interp_unit_matmul(x, x0, dx, fp):
    """Hat-function weights W[n,k] = max(0, 1 - |pos_n - k|); out = W @ fp.

    One (N, K) matmul; exact linear interpolation with endpoint clamping.
    ``fp`` may be (K,) or (K, C) — multiple table columns share one weight
    matrix (used to fetch several cosmology columns per query batch).
    """
    shape = x.shape
    n = fp.shape[0]
    pos = jnp.clip((x.reshape(-1) - x0) / dx, 0.0, n - 1.0)
    k = jax.lax.broadcasted_iota(pos.dtype, (1, n), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - k))
    # HIGHEST: see _interp_matmul — default f32 dots are bf16 on TPU.
    out = jnp.dot(
        w, fp, precision=jax.lax.Precision.HIGHEST, preferred_element_type=pos.dtype
    )
    return out.reshape(shape + fp.shape[1:])


def interp_unit_spaced(
    x: jnp.ndarray, x0, dx, fp: jnp.ndarray, method: Optional[str] = None
) -> jnp.ndarray:
    """Linear interpolation on a *uniform* grid ``xp[i] = x0 + i*dx``.

    The bracketing index is arithmetic (no ``searchsorted``); this is the
    hot-path lookup for the PISN-bump mass grid and the log1p(z)-uniform
    cosmology tables.  ``method``: ``"gather"`` (2 dynamic gathers/query),
    ``"matmul"`` (flat hat-weight MXU contraction), or ``"tiled"`` (two-level
    tile-select + in-tile hat, the TPU default — see
    :func:`interp_unit_tiled`).

    **The matmul/tiled formulations require a finite table**: they contract
    zero weights against table entries, and ``0 * inf = NaN`` poisons all
    outputs.  Clamp sentinel -inf knots to large finite values at table
    construction.
    """
    x = jnp.asarray(x)
    fp = jnp.asarray(fp)
    method = method or _default_unit_method()
    if method == "tiled":
        return interp_unit_tiled(x, x0, dx, fp)
    if method == "matmul":
        return _interp_unit_matmul(x, x0, dx, fp)
    return _interp_unit_gather(x, x0, dx, fp)


def interp_unit_tiled(
    x: jnp.ndarray, x0, dx, fp: jnp.ndarray, tile: Optional[int] = None
) -> jnp.ndarray:
    """Two-level uniform-grid linear interpolation (TPU hot-path formulation).

    Mathematically identical to :func:`interp_unit_spaced` but restructured
    for HBM bandwidth: the flat hat-weight matmul materializes an (N, K)
    weight matrix per lookup — at K≈1024 and N≈2·10⁴ that is ~90 MB of
    traffic per pass, which is what saturates the chip in the flagship
    likelihood.  Here the table is cut into T = (K-1)/tile overlapping tiles
    of ``tile+1`` entries and the lookup becomes

      1. a (N, T) one-hot tile selector            [T ≈ 32 comparisons/query]
      2. one (N, T) @ (T, (tile+1)·C) MXU matmul   [fetches each query's tile]
      3. an in-tile hat contraction over tile+1 entries.

    Materialized traffic drops to N·(T + 2(tile+1)·C) values — ~16x less at
    K = 1024 — while staying exact linear interpolation with clamped ends.

    ``fp``: (K,) or (K, C); tables not divisible by ``tile`` are edge-padded.

    ``tile=None`` picks the traffic-optimal size: materialized values per
    query are T + 2(tile+1)·C with T = (K-1)/tile, minimized at
    tile* = sqrt((K-1)/(2C)) — rounded down to a power of two in [8, 32].
    Measured on v5e (flagship 64-chain value+grad, scratch/r5_sweep.py):
    tile 8 vs 32 on the K=256 mass table is 0.9 ms/eval faster.
    """
    x = jnp.asarray(x)
    fp = jnp.asarray(fp)
    squeeze = fp.ndim == 1
    if squeeze:
        fp = fp[:, None]
    k, c = fp.shape
    if tile is None:
        opt = math.sqrt(max(k - 1, 1) / (2.0 * c))
        tile = min(32, max(8, 2 ** int(math.log2(max(opt, 1.0)))))
    kq = k  # query clamp bound (original table)
    if (k - 1) % tile != 0:
        # edge-pad to the next tile boundary; queries clamp to the original
        # range so padded entries act as constant extrapolation (never hit)
        pad = tile - (k - 1) % tile
        fp = jnp.concatenate([fp, jnp.broadcast_to(fp[-1:], (pad, c))], axis=0)
        k = k + pad
    t = (k - 1) // tile
    dtype = x.dtype

    shape = x.shape
    pos = jnp.clip((x.reshape(-1) - x0) / dx, 0.0, kq - 1.0)
    n = pos.shape[0]

    # stage 1: tile selector (clip pos == K-1 into the last tile)
    tile_f = jnp.minimum(jnp.floor(pos / tile), t - 1.0)
    tids = jax.lax.broadcasted_iota(dtype, (1, t), 1)
    onehot = (tile_f[:, None] == tids).astype(dtype)  # (N, T)

    # stage 2: fetch each query's (tile+1, C) sub-table with one matmul.
    # Overlapping tiles: tile j covers entries [j*tile, j*tile + tile], so a
    # bracket [lo, lo+1] with lo in [j*tile, j*tile+tile-1] never straddles.
    stacked = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(fp, j * tile, tile + 1, axis=0).reshape(-1)
            for j in range(t)
        ],
        axis=0,
    )  # (T, (tile+1)*C) — static slices of the (traced) table
    # HIGHEST: see _interp_matmul — the default f32 dot is a single bf16
    # pass on the TPU MXU, which would round every fetched table value by
    # ~2^-9 relative (±0.004 in z, ~0.1 nats in log-density lookups).
    vals = jnp.dot(
        onehot, stacked, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    )
    vals = vals.reshape(n, tile + 1, c)

    # stage 3: in-tile hat weights
    local = pos - tile_f * tile  # in [0, tile]
    j = jax.lax.broadcasted_iota(dtype, (1, tile + 1), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - j))  # (N, tile+1)
    out = jnp.einsum("nt,ntc->nc", w, vals, precision=jax.lax.Precision.HIGHEST)
    if squeeze:
        out = out[:, 0]
        return out.reshape(shape)
    return out.reshape(shape + (c,))


# ------------------------------------------------------- static-bracket fetch


def static_bracket_weights(x, x0: float, dx: float, n: int):
    """Precompute constant linear-interp brackets for *data* queries.

    When the query points are data constants and the grid is static (the
    detector-frame table: queries are the observed log dL, the grid is the
    catalog's static log-dL range), the bracket selection and in-cell
    position do not depend on the sampled draw at all.  Computing them once
    in float64 numpy turns every subsequent lookup into one small matmul
    against the (traced) table — see :func:`fetch_static_bracket`.

    This is the round-5 fix for the flagship hot loop: the per-eval tiled
    fetch materialized O(N·tile) intermediates per chain and left the chip
    HBM-bound at 92% of peak bandwidth (measured: 6.6 of 10.6 ms of the
    64-chain value+grad was this fetch; ``scratch/r5_roofline.py``).

    Returns ``(onehot, frac)`` numpy arrays: ``onehot`` is (N, n-1) float32
    with a single 1 per row selecting the left knot, ``frac`` (N,) float32 is
    the in-cell position in [0, 1].  Queries are clamped to the grid
    (constant extrapolation), matching :func:`interp_unit_spaced`.
    """
    import numpy as np

    pos = np.clip(
        (np.asarray(x, dtype=np.float64).reshape(-1) - float(x0)) / float(dx),
        0.0,
        n - 1.0,
    )
    lo = np.minimum(np.floor(pos), n - 2).astype(np.int64)
    frac = (pos - lo).astype(np.float32)
    onehot = np.zeros((pos.shape[0], n - 1), dtype=np.float32)
    onehot[np.arange(pos.shape[0]), lo] = 1.0
    return onehot, frac


def fetch_static_bracket(onehot, frac, fp: jnp.ndarray) -> jnp.ndarray:
    """Linear-interp fetch through precomputed constant brackets.

    ``fp`` is the traced table, (K,) or (K, C); ``onehot``/``frac`` come from
    :func:`static_bracket_weights` with ``n = K``.  One (N, K-1) @ (K-1, 2C)
    matmul fetches both bracket endpoints for every query; the lerp happens
    outside the contraction so the interpolation position keeps full f32
    precision.  ``Precision.HIGHEST`` keeps the table values f32-exact on
    TPU (the MXU's default f32 dot is a single bf16 pass, ~8 mantissa bits —
    too coarse for log-density and redshift tables).

    Under ``vmap`` over draws the (constant) ``onehot`` is not batched, so
    XLA contracts all chains' tables in one well-shaped matmul.
    """
    fp = jnp.asarray(fp)
    squeeze = fp.ndim == 1
    f2 = fp[:, None] if squeeze else fp
    onehot = jnp.asarray(onehot, dtype=f2.dtype)
    frac = jnp.asarray(frac, dtype=f2.dtype)
    cols = jnp.concatenate([f2[:-1], f2[1:]], axis=1)  # (K-1, 2C)
    vals = jnp.dot(
        onehot, cols, precision=jax.lax.Precision.HIGHEST, preferred_element_type=f2.dtype
    )
    c = f2.shape[1]
    lo, hi = vals[:, :c], vals[:, c:]
    out = lo + frac[:, None] * (hi - lo)
    return out[:, 0] if squeeze else out


def inverse_interp(y: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Inverse lookup: find ``x`` such that ``interp(x, xp, fp) = y``.

    Requires ``fp`` strictly increasing (true for the cosmology distance
    tables).  Equivalent to the reference's swapped-argument interpolation
    ``jnp.interp(dL, dlinterp, zinterp)`` (``intensity_models.py:272-273``)
    but kept as a named primitive so sharded callers and future Pallas
    implementations have a single point of truth.
    """
    return interp(y, fp, xp)
