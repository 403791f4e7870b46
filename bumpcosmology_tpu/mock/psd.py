"""Design-sensitivity noise power spectral densities (device kernels).

The reference evaluates LAL's tabulated design curves
``SimNoisePSDaLIGODesignSensitivityP1200087`` (H1/L1) and
``SimNoisePSDAdVDesignSensitivityP1200087`` (V1)
(``src/scripts/mock_injections.py:74-76``).  LAL's tables are not available
here, so we use documented closed-form approximations:

* **aLIGO design**: the widely used analytic fit (Ajith 2011, arXiv:1107.1267)
    S_n(f) = 1e-49 [ x^-4.14 − 5 x^-2 + 111 (1 − x² + x⁴/2)/(1 + x²/2) ],
  x = f/215 Hz — the correct low-frequency wall, bucket and shot-noise rise.
* **AdV design**: the aLIGO shape rescaled in amplitude so the BNS horizon
  ratio matches the design studies (AdV ≈ 0.55 x the aLIGO design range):
  S_V1 = S_aLIGO / 0.55².  This is a *documented approximation*; the campaign
  detection threshold (SNR > 10, ``mock_injections.py:199``) is the
  calibration knob, and PSDs can be swapped for tabulated curves via
  :func:`tabulated_psd`.

**float32 scaling**: physical strain PSDs (~1e-49..1e-46 /Hz) underflow
float32 (min normal ~1.2e-38), so every PSD here returns S_n / ``PSD_SCALE``
with ``PSD_SCALE = 1e-46`` — values of order 1e-3..1e3.  The SNR kernel
(:mod:`bumpcosmology_tpu.mock.snr`) pairs this with amplitudes scaled by
``AMP_SCALE = 1e23``; the product ``AMP_SCALE² · PSD_SCALE = 1`` makes the
SNR integrand exactly invariant.  Masked bins (below ``f_low``) return +inf
so they contribute zero SNR.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "PSD_SCALE",
    "aligo_design_psd",
    "advirgo_design_psd",
    "tabulated_psd",
    "PSDS",
]

PSD_SCALE = 1e-46  # returned PSDs are S_n / PSD_SCALE
_ADV_AMPLITUDE_RATIO = 0.55  # AdV/aLIGO design horizon ratio (amplitude)

# Amplitude calibration of the Ajith analytic fit against the *published*
# aLIGO design (P1200087) BNS range of ~173-190 Mpc: the raw fit yields a
# 1.4+1.4 Msun range of 220 Mpc with this framework's kernel (optimal-SNR-8
# horizon / 2.264), ~16% optimistic.  Scaling S_n by (220/181)^2 pins the
# range to 181 Mpc (band midpoint); verified by
# ``tests/test_mock.py::test_bns_range_matches_published_design``.
_ALIGO_RANGE_CALIBRATION = (220.0 / 181.0) ** 2


def aligo_design_psd(f, f_low: float = 10.0):
    """Analytic aLIGO design PSD in units of ``PSD_SCALE``/Hz (Ajith 2011
    fit, amplitude-calibrated to the published P1200087 BNS range)."""
    f = jnp.asarray(f)
    x = f / 215.0
    s = 1e-3 * _ALIGO_RANGE_CALIBRATION * (
        x ** (-4.14) - 5.0 / (x * x) + 111.0 * (1.0 - x * x + 0.5 * x**4) / (1.0 + 0.5 * x * x)
    )  # = S_n / 1e-46
    return jnp.where((f < f_low) | (s <= 0), jnp.inf, s)


def advirgo_design_psd(f, f_low: float = 10.0):
    """Advanced Virgo design PSD (scaled units): amplitude-rescaled aLIGO
    shape (documented approximation, see module docstring)."""
    return aligo_design_psd(f, f_low) / (_ADV_AMPLITUDE_RATIO**2)


def tabulated_psd(freqs: np.ndarray, values: np.ndarray, f_low: float = 10.0):
    """Wrap a tabulated *physical* (f, S_n) curve as a scaled-PSD callable
    (log-log interpolation)."""
    lf = np.log(np.asarray(freqs, dtype=np.float64))
    lv = np.log(np.asarray(values, dtype=np.float64) / PSD_SCALE)

    def psd(f):
        f = jnp.asarray(f)
        out = jnp.exp(jnp.interp(jnp.log(f), jnp.asarray(lf, f.dtype), jnp.asarray(lv, f.dtype)))
        return jnp.where(f < f_low, jnp.inf, out)

    return psd


PSDS = {"H1": aligo_design_psd, "L1": aligo_design_psd, "V1": advirgo_design_psd}
