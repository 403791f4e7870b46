"""Pallas TPU kernel: fused PISN-bump grid fill + log-trapezoid reduction.

The hottest per-draw table build of the likelihood
(``models/mass.py::pisn_bump_log_dndm_grid``, cf. reference
``intensity_models.py:96-108``) is a (G, G) Gaussian-kernel fill followed by a
log-domain trapezoid over the CO-mass axis.  In XLA this lowers to a dozen
small elementwise + reduce ops with HBM round-trips between them; here the
whole build runs as ONE VMEM-resident kernel (fill, logaddexp pairing,
max-shift, exp, row reduce) and — since Pallas kernels are not differentiable
by tracing — ships a hand-derived backward kernel through ``jax.custom_vjp``.

The derivative accounts for the *parameter-dependent grid coordinates*
(``mbh_hi = mbhmax + 7σ``, ``mco_hi = largest_mco(mpisn, mbhmax)``): each
K_ij depends on θ directly and through mbh_i(θ), mco_j(θ), and the trapezoid
measure log(dmco/2) is itself θ-dependent.  Verified against JAX autodiff of
the pure-jnp implementation to ~1e-5 (``tests/test_pallas_bump.py``).

Only ``log_dn`` goes through the kernel; the scalar outputs (``dmbh`` etc.)
stay ordinary traced JAX so their gradients flow by autodiff.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)
_MCO_BREAK = 20.0
_GRID_MBH_LO = 3.0
_GRID_MCO_LO = 1.0


def _grids(scal_ref, shape, dtype):
    """(mbh, mco, r, inside_parab, mco_peak, curv) shared by fwd and bwd.

    ``scal_ref`` is the SMEM ref; Mosaic permits only scalar loads from SMEM,
    so every parameter is read individually."""
    a, b, mpisn, mbhmax, sigma, dmbh, dmco = [scal_ref[0, k] for k in range(7)]
    # Mosaic iota is integer-only; cast to the compute dtype afterwards
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(dtype)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(dtype)
    mbh = _GRID_MBH_LO + i * dmbh
    mco = _GRID_MCO_LO + j * dmco

    curv = 1.0 / (4.0 * (mpisn - mbhmax))
    mco_peak = 2.0 * mbhmax - mpisn
    parab = mco >= mpisn
    mu = jnp.where(parab, mbhmax + curv * (mco - mco_peak) ** 2, mco)
    r = (mbh - mu) / sigma

    lj = jnp.log(mco / _MCO_BREAK)
    high = mco >= _MCO_BREAK
    logc = jnp.where(high, -b * lj, -a * lj)
    k_mat = logc - 0.5 * r * r - 0.5 * _LOG_2PI - jnp.log(sigma)
    return i, j, mbh, mco, mu, r, lj, high, parab, mco_peak, curv, k_mat


def _fwd_kernel(scal_ref, out_ref):
    shape = out_ref.shape[0], out_ref.shape[0]
    dtype = out_ref.dtype
    dmco = scal_ref[0, 6]
    *_, k_mat = _grids(scal_ref, shape, dtype)

    seg = jnp.logaddexp(k_mat[:, :-1], k_mat[:, 1:])
    m = jnp.max(seg, axis=1, keepdims=True)
    ssum = jnp.sum(jnp.exp(seg - m), axis=1, keepdims=True)
    out_ref[:, :] = m + jnp.log(ssum) + jnp.log(0.5 * dmco)


def _bwd_kernel(scal_ref, logdn_ref, g_ref, out_ref):
    g_len = logdn_ref.shape[0]
    shape = (g_len, g_len)
    dtype = logdn_ref.dtype
    a, b, mpisn, mbhmax, sigma, dmbh, dmco = [scal_ref[0, k] for k in range(7)]
    dmco_dmpisn = scal_ref[0, 7]  # d(mco_hi)/d(mpisn) / (G-1)
    dmco_dmbhmax = scal_ref[0, 8]  # d(mco_hi)/d(mbhmax) / (G-1)
    phi_scale = scal_ref[0, 9]  # 1/(G-1)

    i, j, mbh, mco, mu, r, lj, high, parab, mco_peak, curv, k_mat = _grids(
        scal_ref, shape, dtype
    )

    # Per-cell weight: out_i = log(dmco/2) + log Σ_j c_j e^{K_ij} with c_j = 2
    # for interior knots (shared by two trapezoid segments) and 1 at the ends,
    # so ∂out_i/∂K_ij = c_j · e^{K_ij - L_i}, L_i = out_i - log(dmco/2).
    L = logdn_ref[:] - jnp.log(0.5 * dmco)  # (G, 1)
    p = jnp.exp(k_mat - L)
    first = j == 0.0
    last = j == float(g_len - 1)
    w = p * jnp.where(first | last, 1.0, 2.0)
    gw = g_ref[:] * w  # (G, G) cotangent-weighted cell mass

    dmu_dmco = jnp.where(parab, 2.0 * curv * (mco - mco_peak), 1.0)
    dmu_dmpisn = jnp.where(
        parab, -4.0 * curv * curv * (mco - mco_peak) ** 2 + 2.0 * curv * (mco - mco_peak), 0.0
    )
    dmu_dmbhmax = jnp.where(
        parab, 1.0 + 4.0 * curv * curv * (mco - mco_peak) ** 2 - 4.0 * curv * (mco - mco_peak), 0.0
    )
    dc_dmco = jnp.where(high, -b, -a) / mco
    dk_dmco = dc_dmco + (r / sigma) * dmu_dmco  # via mu(mco)
    phi_i = i * phi_scale
    phi_j = j * phi_scale

    g_sum = jnp.sum(g_ref[:])

    # d out / d a and b: only through logc
    da = jnp.sum(gw * jnp.where(high, 0.0, -lj))
    db = jnp.sum(gw * jnp.where(high, -lj, 0.0))

    # sigma: direct (r^2/sigma - 1/sigma) + mbh-grid motion (7 phi_i)
    dsig = jnp.sum(gw * ((r * r - 1.0) / sigma + (-r / sigma) * (7.0 * phi_i)))

    # mpisn: direct mu + mco-grid motion + measure term
    dmp = jnp.sum(
        gw * ((r / sigma) * dmu_dmpisn + dk_dmco * (phi_j * dmco_dmpisn * (g_len - 1.0)))
    ) + g_sum * (dmco_dmpisn * (g_len - 1.0) / ((g_len - 1.0) * dmco))

    # mbhmax: direct mu + mbh-grid motion + mco-grid motion + measure term
    dmb = jnp.sum(
        gw
        * (
            (r / sigma) * dmu_dmbhmax
            + (-r / sigma) * phi_i
            + dk_dmco * (phi_j * dmco_dmbhmax * (g_len - 1.0))
        )
    ) + g_sum * (dmco_dmbhmax * (g_len - 1.0) / ((g_len - 1.0) * dmco))

    # assemble the (1, 8) gradient row with iota masks (no scatter in Mosaic)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    out_ref[:, :] = (
        da * (k == 0) + db * (k == 1) + dmp * (k == 2) + dmb * (k == 3) + dsig * (k == 4)
    ).astype(dtype)


def _pack_scalars(a, b, mpisn, mbhmax, sigma, n_grid, dtype):
    gm1 = n_grid - 1.0
    mbh_hi = mbhmax + 7.0 * sigma
    root = jnp.sqrt(mbhmax * (mbhmax - mpisn))
    mco_hi = 2.0 * mbhmax - mpisn + 2.0 * root
    dmbh = (mbh_hi - _GRID_MBH_LO) / gm1
    dmco = (mco_hi - _GRID_MCO_LO) / gm1
    dmcohi_dmpisn = -1.0 - mbhmax / root
    dmcohi_dmbhmax = 2.0 + (2.0 * mbhmax - mpisn) / root
    return jnp.stack(
        [
            a, b, mpisn, mbhmax, sigma, dmbh, dmco,
            dmcohi_dmpisn / gm1, dmcohi_dmbhmax / gm1,
            jnp.asarray(1.0 / gm1, dtype),
        ]
    ).astype(dtype)[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bump_log_dn_pallas(a, b, mpisn, mbhmax, sigma, n_grid=256, interpret=False):
    """(G,) log dN/dm of the PISN bump on its uniform mass grid — fused kernel.

    Scalar outputs (``mbh_lo``, ``dmbh``) are computed by the caller in plain
    JAX; this primitive covers only the (G, G) fill + log-trapz, with an
    analytic backward kernel.
    """
    return _bump_fwd_impl(a, b, mpisn, mbhmax, sigma, n_grid, interpret)


def _bump_fwd_impl(a, b, mpisn, mbhmax, sigma, n_grid, interpret):
    dtype = jnp.result_type(a, b, mpisn, mbhmax, sigma)
    if dtype not in (jnp.float32,):
        dtype = jnp.float32
    scal = _pack_scalars(
        jnp.asarray(a, dtype), jnp.asarray(b, dtype), jnp.asarray(mpisn, dtype),
        jnp.asarray(mbhmax, dtype), jnp.asarray(sigma, dtype), n_grid, dtype
    )
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n_grid, 1), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal)
    return out[:, 0]


def _bump_vjp_fwd(a, b, mpisn, mbhmax, sigma, n_grid, interpret):
    logdn = _bump_fwd_impl(a, b, mpisn, mbhmax, sigma, n_grid, interpret)
    return logdn, (a, b, mpisn, mbhmax, sigma, logdn)


def _bump_vjp_bwd(n_grid, interpret, res, g):
    a, b, mpisn, mbhmax, sigma, logdn = res
    dtype = logdn.dtype
    scal = _pack_scalars(
        jnp.asarray(a, dtype), jnp.asarray(b, dtype), jnp.asarray(mpisn, dtype),
        jnp.asarray(mbhmax, dtype), jnp.asarray(sigma, dtype), n_grid, dtype
    )
    grads = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal, logdn[:, None], jnp.asarray(g, dtype)[:, None])
    da, db, dmp, dmb, dsig = (grads[0, k] for k in range(5))
    cast = lambda v, like: v.astype(jnp.asarray(like).dtype)
    return (cast(da, a), cast(db, b), cast(dmp, mpisn), cast(dmb, mbhmax), cast(dsig, sigma))


bump_log_dn_pallas.defvjp(_bump_vjp_fwd, _bump_vjp_bwd)
