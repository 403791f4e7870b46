"""Pallas TPU kernel: the fused detector-frame log-weight evaluation.

This is the flagship joint likelihood's hot loop (reference
``intensity_models.py:378-388`` inside ``pop_cosmo_model``): for every
event PE sample and selection injection,

    v  = log dL
    z, log_jac = interp(det table @ v)          # z(dL) + frame Jacobian
    m1 = m1_det / (1+z);  m2 = q m1
    log_wt = log dN/dm(m1) + log dN/dm(m2)      # bump-table interp + tail
           + beta log[(m1+m2)/(MREF(1+QREF))] + log m1
           + log dN/dV(z) - 2 log1p(z) + log_jac - log pdraw.

The XLA formulation (``inference/likelihoods.py::_cosmo_frame_logwts_fused``)
is exact but HBM-bound: each tiled-interp lookup materializes (N, T) selector
and (N, tile+1) bracket matrices between kernels, ~300 B of traffic per query
against 16 B of actual input.  Here the ENTIRE per-query chain runs in one
VMEM-resident kernel: queries stream in as (block, 4) tiles, the per-draw
tables (a few KB) sit in VMEM, every intermediate lives on-chip, and only the
(block,) log-weights stream out.

Differentiation: Pallas kernels are opaque to tracing autodiff, so the op is
a ``jax.custom_vjp``.  The backward kernel does NOT hand-derive the chain
rule — it calls ``jax.vjp`` of the *same* block computation inside the
kernel body (recompute-and-transpose, all VMEM-resident), so gradients agree
with the XLA path by construction; ``tests/test_pallas_logwts.py`` pins both
value and cotangent parity.

Table layout: the wrapper pre-stacks each table into overlapping
``(T, tile+1)`` tile matrices in plain JAX (differentiable — cotangents fold
back through the stacking), so the kernel's lookups are
``one-hot-tile-select @ tile-matrix`` MXU contractions plus an in-tile hat
reduction, with no reshapes of awkward shapes inside Mosaic.

Used on the TPU backend via ``inference/likelihoods.set_logwts_impl`` /
auto-default; CPU and f64 runs keep the XLA path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cosmo_frame_logwts_pallas"]

_TILE = 32
_LOG2 = math.log(2.0)
_MBH_MIN = 5.0  # models/mass.py::MBH_MIN (``intensity_models.py:13``)
_MREF = 30.0  # models/mass.py::MREF
_QREF = 1.0  # models/population.py::QREF
_NS = 15  # scalar slots (below)

# scalar slot order inside the (1, _NS) SMEM vector
# [v0, dv, mbh_lo, dmbh, mbh_hi, c, mbhmax, log_pl_norm, log_norm,
#  beta, lam, kappa, zp, kq_z, kq_m]
#   kq_z / kq_m: float copies of the ORIGINAL table lengths (clamp bounds —
#   tile padding must act as never-hit constant extrapolation).


def _tiled_lookup(pos, tiles, n_tiles: int, dtype):
    """Exact linear interp of a tile-stacked table at integer-grid ``pos``.

    ``pos``: (N,) already clipped to [0, K-1] in table-index units.
    ``tiles``: (n_tiles, _TILE+1) overlapping tile matrix of the table.
    Same mathematics as ``ops/interp.py::interp_unit_tiled`` (tile j covers
    entries [j*_TILE, j*_TILE + _TILE], so a bracket never straddles).
    """
    tile_f = jnp.minimum(jnp.floor(pos / _TILE), n_tiles - 1.0)
    tids = jax.lax.broadcasted_iota(jnp.int32, (1, n_tiles), 1).astype(dtype)
    sel = (tile_f[:, None] == tids).astype(dtype)  # (N, T)
    vals = jnp.dot(sel, tiles, preferred_element_type=dtype)  # (N, _TILE+1)
    local = pos - tile_f * _TILE
    j = jax.lax.broadcasted_iota(jnp.int32, (1, _TILE + 1), 1).astype(dtype)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(local[:, None] - j))
    return jnp.sum(hat * vals, axis=1)


def _block_logwts(det_z, det_j, bump_t, scal, a, q, dl, log_pdraw):
    """The per-query weight chain on one block — pure jnp, Mosaic-lowerable.

    ``scal`` is a tuple of traced scalars (slot order above); shared by the
    forward kernel and the in-kernel ``jax.vjp`` of the backward kernel.
    """
    (v0, dv, mbh_lo, dmbh, mbh_hi, c, mbhmax, log_pl_norm, log_norm,
     beta, lam, kappa, zp, kq_z, kq_m) = scal
    dtype = a.dtype
    tz = det_z.shape[0]
    tm = bump_t.shape[0]

    # --- z(dL) + frame Jacobian from the detector table (2 shared-bracket cols)
    v = jnp.log(dl)
    pos_z = jnp.clip((v - v0) / dv, 0.0, kq_z - 1.0)
    z = _tiled_lookup(pos_z, det_z, tz, dtype)
    log_jac = _tiled_lookup(pos_z, det_j, tz, dtype)

    # --- source-frame masses; both dN/dm lookups batched into one contraction
    m1 = a / (1.0 + z)
    m2 = q * m1
    ms = jnp.concatenate([m1, m2])
    pos_m = jnp.clip((ms - mbh_lo) / dmbh, 0.0, kq_m - 1.0)
    log_bump = _tiled_lookup(pos_m, bump_t, tm, dtype)
    # hard support cut outside the tabulated bump (models/mass.py:168-170)
    log_bump = jnp.where((ms <= mbh_lo) | (ms >= mbh_hi), -jnp.inf, log_bump)
    # power-law tail + smooth turn-on at mbhmax (models/mass.py:171-175)
    log_tail = (
        -c * jnp.log(ms / mbhmax)
        + log_pl_norm
        + _LOG2
        - jax.nn.softplus(-(ms - mbhmax) / (0.05 * mbhmax))
    )
    log_dndm = jnp.logaddexp(log_bump, log_tail)
    log_dndm = jnp.where(ms < _MBH_MIN, -jnp.inf, log_dndm) + log_norm
    n = a.shape[0]
    ldn1, ldn2 = log_dndm[:n], log_dndm[n:]

    # --- Madau-Dickinson rate shape, normalized at z=0 (models/redshift.py)
    # log1p(x**k) spelled softplus(k*log x): mathematically identical for
    # x > 0, and avoids math.powf, which Mosaic does not legalize on TPU.
    opz_ratio = (1.0 + z) / (1.0 + zp)
    log_dndv = (
        lam * jnp.log1p(z)
        - jax.nn.softplus(kappa * jnp.log(opz_ratio))
        + jax.nn.softplus(-kappa * jnp.log1p(zp))
    )

    return (
        ldn1
        + ldn2
        + beta * jnp.log((m1 + m2) / (_MREF * (1.0 + _QREF)))
        + jnp.log(m1)
        + log_dndv
        - 2.0 * jnp.log1p(z)
        + log_jac
        - log_pdraw
    )


def _read_scal(scal_ref):
    return tuple(scal_ref[0, k] for k in range(_NS))


def _fwd_kernel(scal_ref, det_z_ref, det_j_ref, bump_ref, q_ref, out_ref):
    qarr = q_ref[:]
    out_ref[:] = _block_logwts(
        det_z_ref[:], det_j_ref[:], bump_ref[:], _read_scal(scal_ref),
        qarr[:, 0], qarr[:, 1], qarr[:, 2], qarr[:, 3],
    )


def _bwd_kernel(scal_ref, det_z_ref, det_j_ref, bump_ref, q_ref, g_ref,
                d_z_ref, d_j_ref, d_b_ref, d_s_ref):
    """Per-block partial cotangents via in-kernel recompute + ``jax.vjp``."""
    qarr = q_ref[:]
    scal = _read_scal(scal_ref)

    def f(det_z, det_j, bump_t, scal_t):
        return _block_logwts(
            det_z, det_j, bump_t, scal_t,
            qarr[:, 0], qarr[:, 1], qarr[:, 2], qarr[:, 3],
        )

    _, vjp = jax.vjp(f, det_z_ref[:], det_j_ref[:], bump_ref[:], scal)
    d_z, d_j, d_b, d_s = vjp(g_ref[:])
    d_z_ref[:] = d_z[None]
    d_j_ref[:] = d_j[None]
    d_b_ref[:] = d_b[None]
    # assemble the (1, _NS) scalar-cotangent row (no scatter in Mosaic)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
    row = jnp.zeros((1, _NS), dtype=d_z.dtype)
    for idx, val in enumerate(d_s):
        row = row + val * (k == idx).astype(d_z.dtype)
    d_s_ref[:] = row[None]


def _fwd_call(det_z, det_j, bump_t, scal, qarr, block, interpret):
    n = qarr.shape[0]
    nblocks = n // block
    tz = det_z.shape[0]
    tm = bump_t.shape[0]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, _NS), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tz, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tz, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda j: (j,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), qarr.dtype),
        interpret=interpret,
    )(scal, det_z, det_j, bump_t, qarr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _logwts_core(block, interpret, det_z, det_j, bump_t, scal, qarr):
    return _fwd_call(det_z, det_j, bump_t, scal, qarr, block, interpret)


def _logwts_core_fwd(block, interpret, det_z, det_j, bump_t, scal, qarr):
    out = _fwd_call(det_z, det_j, bump_t, scal, qarr, block, interpret)
    return out, (det_z, det_j, bump_t, scal, qarr)


def _logwts_core_bwd(block, interpret, res, g):
    det_z, det_j, bump_t, scal, qarr = res
    n = qarr.shape[0]
    nblocks = n // block
    tz = det_z.shape[0]
    tm = bump_t.shape[0]
    dtype = qarr.dtype
    d_z, d_j, d_b, d_s = pl.pallas_call(
        _bwd_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, _NS), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tz, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tz, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, _TILE + 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tz, _TILE + 1), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tz, _TILE + 1), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, _TILE + 1), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _NS), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, tz, _TILE + 1), dtype),
            jax.ShapeDtypeStruct((nblocks, tz, _TILE + 1), dtype),
            jax.ShapeDtypeStruct((nblocks, tm, _TILE + 1), dtype),
            jax.ShapeDtypeStruct((nblocks, 1, _NS), dtype),
        ],
        interpret=interpret,
    )(scal, det_z, det_j, bump_t, qarr, g)
    return (
        jnp.sum(d_z, axis=0),
        jnp.sum(d_j, axis=0),
        jnp.sum(d_b, axis=0),
        jnp.sum(d_s, axis=0),
        jnp.zeros_like(qarr),  # queries are data — no cotangent
    )


_logwts_core.defvjp(_logwts_core_fwd, _logwts_core_bwd)


def _stack_tiles(col):
    """(K,) table column -> (T, _TILE+1) overlapping tile matrix.

    Plain differentiable JAX (runs once per draw outside the kernel); pads the
    final entry so (K-1) divides into _TILE-sized tiles — queries clamp to the
    original K-1, so padding acts as never-hit constant extrapolation.
    """
    k = col.shape[0]
    if (k - 1) % _TILE != 0:
        pad = _TILE - (k - 1) % _TILE
        col = jnp.concatenate([col, jnp.broadcast_to(col[-1:], (pad,))])
        k = col.shape[0]
    t = (k - 1) // _TILE
    return jnp.stack([col[j * _TILE : j * _TILE + _TILE + 1] for j in range(t)])


def cosmo_frame_logwts_pallas(pop, det, a, q, dl, log_pdraw, block: int = 4096,
                              interpret: bool = False):
    """Drop-in fused-kernel twin of ``_cosmo_frame_logwts_fused``.

    ``pop``: models.population.PopulationIntensity (per-draw);
    ``det``: models.cosmology.DetectorFrameTable (per-draw);
    ``a``/``q``/``dl``/``log_pdraw``: query arrays of a common shape (data).
    Float32 only (the TPU hot path); callers keep the XLA route for f64/CPU.
    """
    mt = pop.mass_table
    dtype = jnp.float32
    shape = jnp.shape(a)

    det_z = _stack_tiles(det.cols[:, 0].astype(dtype))
    det_j = _stack_tiles(det.cols[:, 1].astype(dtype))
    bump_t = _stack_tiles(mt.log_bump.astype(dtype))
    rs = pop.params.redshift
    scal = jnp.stack([
        jnp.asarray(det.v0, dtype), jnp.asarray(det.dv, dtype),
        jnp.asarray(mt.mbh_lo, dtype), jnp.asarray(mt.dmbh, dtype),
        jnp.asarray(mt.mbh_hi, dtype),
        jnp.asarray(mt.params.c, dtype), jnp.asarray(mt.params.mbhmax, dtype),
        jnp.asarray(mt.log_pl_norm, dtype), jnp.asarray(mt.log_norm, dtype),
        jnp.asarray(pop.params.mass.beta, dtype),
        jnp.asarray(rs.lam, dtype), jnp.asarray(rs.kappa, dtype),
        jnp.asarray(rs.zp, dtype),
        jnp.asarray(float(det.cols.shape[0]), dtype),
        jnp.asarray(float(mt.log_bump.shape[0]), dtype),
    ])[None, :]

    qarr = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(x, dtype), shape).reshape(-1)
            for x in (a, q, dl, log_pdraw)
        ],
        axis=1,
    )
    n = qarr.shape[0]
    n_pad = -(-n // block) * block
    if n_pad != n:
        # edge-repeat padding: valid finite queries whose outputs are sliced
        # off; their backward cotangents arrive as zeros
        qarr = jnp.concatenate([qarr, jnp.broadcast_to(qarr[-1:], (n_pad - n, 4))])
    out = _logwts_core(block, interpret, det_z, det_j, bump_t, scal, qarr)
    return out[:n].reshape(shape)
