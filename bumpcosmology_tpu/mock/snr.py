"""Batched network SNR kernel (the LALSuite + Pool replacement).

The reference computes one injection SNR per fork-pool task by generating a
full IMRPhenomXPHM waveform in C (``src/scripts/mock_injections.py:31-81,
142,190``).  Here the whole batch is evaluated on-device:

    rho_det² = 4 ∫ |F₊ h₊(f) + F× h×(f)|² / S_n(f) df
             = 4 ∫ A(f)² [ F₊² ((1+cos²ι)/2)² + F×² cos²ι ] / S_n(f) df

on a **static log-spaced frequency grid** (the integrand is smooth in log f),
so every injection shares one compiled kernel — no per-injection FFT-length
logic (``next_pow_2``/chirp-time sizing, ``mock_injections.py:15-19,51-57``)
is needed.  vmap over the injection axis replaces ``multiprocessing.Pool``;
chunked evaluation bounds device memory at 10⁷-injection scale.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.mock.detector import DETECTORS, antenna_pattern
from bumpcosmology_tpu.mock.psd import PSDS
from bumpcosmology_tpu.mock.waveform import phenom_a_amplitude

# float32 scaling pair with bumpcosmology_tpu.mock.psd: amplitudes are scaled
# by AMP_SCALE before squaring (A^2 ~ 1e-46 underflows f32), PSDs come back in
# units of PSD_SCALE = 1e-46; AMP_SCALE^2 * PSD_SCALE = 1 keeps rho^2 exact.
AMP_SCALE = 1e23

__all__ = [
    "frequency_grid",
    "network_snr",
    "network_snr_batched",
    "amplitude_factor",
    "projection_factor",
    "draw_projection_factors",
]

DEFAULT_F_MIN = 10.0  # psdstart in the reference (``mock_injections.py:49``)
DEFAULT_F_MAX = 2048.0  # fmax (``mock_injections.py:54``)
DEFAULT_N_F = 512


def frequency_grid(f_min=DEFAULT_F_MIN, f_max=DEFAULT_F_MAX, n=DEFAULT_N_F):
    """Static log-spaced frequency grid [Hz]."""
    return jnp.exp(jnp.linspace(math.log(f_min), math.log(f_max), n))


def network_snr(
    m1_det,
    m2_det,
    dl_gpc,
    iota,
    ra,
    dec,
    psi,
    gmst,
    f_grid,
    detectors: Sequence[str] = ("H1", "L1", "V1"),
    use_pallas: bool = False,
    psds=None,
):
    """Per-detector and network SNR for a batch of injections.

    All source arguments shaped (batch,); returns dict with per-detector SNRs
    and ``net`` = sqrt(sum of squares) (cf. ``mock_injections.py:63-79``).

    All *default* design PSDs share one spectral shape (V1 is an
    amplitude-rescaled aLIGO curve, :mod:`bumpcosmology_tpu.mock.psd`), so the
    expensive frequency integral ∫A²/S df is computed **once** per injection
    and per-detector SNRs differ only by the antenna projection and a scalar
    PSD ratio — 3× less bandwidth than integrating per detector.

    ``psds``: optional ``{detector: psd_callable}`` overriding the design
    curves (e.g. :func:`bumpcosmology_tpu.mock.psd.tabulated_psd` wrapping a
    real measured/design table).  Overridden detectors get their own full
    frequency integral since their shape need not match the shared one.
    """
    ci = jnp.cos(iota)
    plus_fac = (0.5 * (1.0 + ci * ci)) ** 2
    cross_fac = ci * ci

    # one reference integral against the aLIGO-shape PSD
    inv_s = 1.0 / PSDS["H1"](f_grid)
    if use_pallas:
        from bumpcosmology_tpu.mock.pallas_snr import snr_integral_pallas

        integral = snr_integral_pallas(
            m1_det, m2_det, dl_gpc, inv_s,
            f_min=float(f_grid[0]), f_max=float(f_grid[-1]), n_f=f_grid.shape[0],
            amp_scale=AMP_SCALE,
        )
    else:
        amp = AMP_SCALE * phenom_a_amplitude(
            f_grid[None, :], m1_det[:, None], m2_det[:, None], dl_gpc[:, None]
        )
        df = jnp.diff(f_grid)
        integrand = amp * amp * inv_s[None, :]
        integral = jnp.sum(
            0.5 * df[None, :] * (integrand[:, 1:] + integrand[:, :-1]), axis=1
        )

    # per-detector scalar PSD ratios relative to the reference shape
    f_probe = jnp.asarray([100.0])
    ref = PSDS["H1"](f_probe)[0]
    psds = psds or {}
    amp2 = None
    df = jnp.diff(f_grid)
    out = {}
    net2 = 0.0
    for det in detectors:
        if det in psds:
            # custom curve: own shape -> own frequency integral
            if amp2 is None:
                a = AMP_SCALE * phenom_a_amplitude(
                    f_grid[None, :], m1_det[:, None], m2_det[:, None], dl_gpc[:, None]
                )
                amp2 = a * a
            integrand = amp2 * (1.0 / psds[det](f_grid))[None, :]
            det_integral = jnp.sum(
                0.5 * df[None, :] * (integrand[:, 1:] + integrand[:, :-1]), axis=1
            )
            scale = 1.0
        else:
            det_integral = integral
            scale = ref / PSDS[det](f_probe)[0]  # 1 for H1/L1, 0.55^2 for V1
        fp, fc = antenna_pattern(DETECTORS[det], ra, dec, psi, gmst)
        proj = fp * fp * plus_fac + fc * fc * cross_fac  # (batch,)
        rho2 = 4.0 * proj * det_integral * scale
        out[det] = jnp.sqrt(rho2)
        net2 = net2 + rho2
    out["net"] = jnp.sqrt(net2)
    return out


# ---------------------------------------------------------------------------
# Exact SNR separability under the default design PSDs
# ---------------------------------------------------------------------------
#
# Because every default PSD shares one spectral shape and |h| ∝ 1/dL, the
# network SNR factorizes EXACTLY as
#
#     snr = A(m1_det, m2_det) · Θ(angles) / dL
#
# with A² = 4 ∫ |h(f; dL=1)|²/S_H1 df a pure function of the detector-frame
# masses and Θ² = Σ_det proj_det · (S_H1/S_det at any f) a pure function of
# the extrinsic angles.  This decomposition is what makes the mock world's
# SNR-observation likelihood g(snr_obs | m1d, q, dL) computable per PE-bank
# sample (one Θ draw folds the angle marginalization into the bank proposal)
# — required for exactly calibrated SBC, see
# ``inference/calibration.py::make_mock_pop_cosmo_simulator_fresh``.


@partial(jax.jit, static_argnames=("n_f",))
def _amp_factor_jit(m1_det, m2_det, n_f: int):
    f_grid = frequency_grid(n=n_f)
    inv_s = 1.0 / PSDS["H1"](f_grid)
    one = jnp.ones_like(m1_det)
    amp = AMP_SCALE * phenom_a_amplitude(
        f_grid[None, :], m1_det[:, None], m2_det[:, None], one[:, None]
    )
    df = jnp.diff(f_grid)
    integrand = amp * amp * inv_s[None, :]
    integral = jnp.sum(0.5 * df[None, :] * (integrand[:, 1:] + integrand[:, :-1]), axis=1)
    return jnp.sqrt(4.0 * integral)


def amplitude_factor(m1_det, m2_det, n_f: int = DEFAULT_N_F, chunk: int = 65536):
    """A(m1_det, m2_det): network SNR per unit Θ at dL = 1 Gpc (numpy out).

    Valid for the default design PSDs only (shared spectral shape); raise on
    custom-PSD campaigns where the factorization does not hold.
    """
    m1_det = np.asarray(m1_det, dtype=np.float32)
    m2_det = np.asarray(m2_det, dtype=np.float32)
    shape = m1_det.shape
    m1f, m2f = m1_det.reshape(-1), m2_det.reshape(-1)
    out = np.empty(m1f.shape, dtype=np.float32)
    for lo in range(0, len(m1f), chunk):
        sl = slice(lo, lo + chunk)
        out[sl] = np.asarray(_amp_factor_jit(jnp.asarray(m1f[sl]), jnp.asarray(m2f[sl]), n_f))
    return out.reshape(shape)


@jax.jit
def _proj_factor_jit(iota, ra, dec, psi, gmst):
    ci = jnp.cos(iota)
    plus_fac = (0.5 * (1.0 + ci * ci)) ** 2
    cross_fac = ci * ci
    f_probe = jnp.asarray([100.0])
    ref = PSDS["H1"](f_probe)[0]
    tot = 0.0
    for det in ("H1", "L1", "V1"):
        fp, fc = antenna_pattern(DETECTORS[det], ra, dec, psi, gmst)
        scale = ref / PSDS[det](f_probe)[0]
        tot = tot + (fp * fp * plus_fac + fc * fc * cross_fac) * scale
    return jnp.sqrt(tot)


def projection_factor(iota, ra, dec, psi, gmst):
    """Θ(angles): the H1/L1/V1 network projection factor (numpy out)."""
    args = [jnp.asarray(np.asarray(x, dtype=np.float32)) for x in (iota, ra, dec, psi, gmst)]
    return np.asarray(_proj_factor_jit(*args))


def draw_projection_factors(rng: np.random.Generator, size):
    """Θ draws under the isotropic angle law of the injection campaign
    (``mock_injections.py:160-168`` semantics: uniform cos ι, sky, ψ, GMST)."""
    iota = np.arccos(rng.uniform(-1.0, 1.0, size=size))
    ra = rng.uniform(0.0, 2.0 * np.pi, size=size)
    dec = np.arcsin(rng.uniform(-1.0, 1.0, size=size))
    psi = rng.uniform(0.0, np.pi, size=size)
    gmst = rng.uniform(0.0, 2.0 * np.pi, size=size)
    return projection_factor(iota, ra, dec, psi, gmst)


@partial(jax.jit, static_argnames=("chunk", "detectors", "n_f", "psd_items"))
def _snr_chunked(args, chunk: int, detectors, n_f: int, psd_items=()):
    f_grid = frequency_grid(n=n_f)
    psds = dict(psd_items) if psd_items else None

    def one_chunk(chunk_args):
        return network_snr(*chunk_args, f_grid, detectors, psds=psds)

    reshaped = jax.tree.map(lambda x: x.reshape(-1, chunk), args)
    return jax.lax.map(one_chunk, reshaped)


def network_snr_batched(
    m1_det,
    m2_det,
    dl_gpc,
    iota,
    ra,
    dec,
    psi,
    gmst,
    chunk: int = 65536,
    detectors: Sequence[str] = ("H1", "L1", "V1"),
    n_f: int = DEFAULT_N_F,
    psds=None,
):
    """Chunked SNR evaluation for very large injection batches (10⁷ scale).

    Pads to a chunk multiple, maps chunks through one compiled kernel, strips
    the padding.  Returns numpy arrays.  ``psds`` as in :func:`network_snr`
    (callables must be hashable — module functions / closures, not lambdas
    rebuilt per call, or the jit cache churns).
    """
    n = len(np.asarray(m1_det))
    chunk = min(chunk, max(1, n))
    n_pad = (-n) % chunk

    def prep(x):
        x = np.asarray(x, dtype=np.float32)
        return jnp.asarray(np.concatenate([x, np.full(n_pad, x[-1], dtype=np.float32)]))

    args = tuple(prep(x) for x in (m1_det, m2_det, dl_gpc, iota, ra, dec, psi, gmst))
    psd_items = tuple(sorted(psds.items())) if psds else ()
    out = _snr_chunked(args, chunk, tuple(detectors), n_f, psd_items)
    return {k: np.asarray(v).reshape(-1)[:n] for k, v in out.items()}
