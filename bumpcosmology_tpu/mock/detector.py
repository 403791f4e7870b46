"""Detector geometry and antenna response (device kernel).

Replaces the reference's ``lal.ComputeDetAMResponse`` /
``cached_detector_by_prefix`` calls (``src/scripts/mock_injections.py:68-69``)
with an explicit Earth-fixed-frame construction:

* a detector is its response tensor D = (u ⊗ u − v ⊗ v)/2 built from arm unit
  vectors derived from (latitude, longitude, arm azimuths);
* F₊/F× are contractions of D with the wave-frame polarization tensors built
  from (ra, dec, psi, gmst).

Geometry follows the standard interferometer parameters (LIGO-T980044 /
LALDetectors): modest arm-azimuth inaccuracies change individual responses
slightly but leave the isotropically averaged selection statistics unchanged
(sky angles are drawn uniformly, ``mock_injections.py:160-167``).

Everything is jnp and broadcasts over batched sky locations.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["DETECTORS", "Detector", "antenna_pattern", "make_response_tensor"]


class Detector(NamedTuple):
    name: str
    response: np.ndarray  # (3,3) response tensor D


def _site_frame(lat_rad, lon_rad):
    """(east, north, up) unit vectors of a site in the Earth-fixed frame."""
    sphi, cphi = math.sin(lat_rad), math.cos(lat_rad)
    slam, clam = math.sin(lon_rad), math.cos(lon_rad)
    east = np.array([-slam, clam, 0.0])
    north = np.array([-sphi * clam, -sphi * slam, cphi])
    up = np.array([cphi * clam, cphi * slam, sphi])
    return east, north, up


def _arm_vector(lat_rad, lon_rad, azimuth_rad):
    """Unit vector of a horizontal arm; azimuth measured clockwise from North
    (compass convention, as in LALDetectors)."""
    east, north, _ = _site_frame(lat_rad, lon_rad)
    return north * math.cos(azimuth_rad) + east * math.sin(azimuth_rad)


def make_response_tensor(lat_deg, lon_deg, x_azi_deg, y_azi_deg) -> np.ndarray:
    u = _arm_vector(math.radians(lat_deg), math.radians(lon_deg), math.radians(x_azi_deg))
    v = _arm_vector(math.radians(lat_deg), math.radians(lon_deg), math.radians(y_azi_deg))
    return 0.5 * (np.outer(u, u) - np.outer(v, v))


# Site parameters (degrees): latitude, longitude, x/y arm azimuths
# (compass, clockwise from North).  Values follow the public LAL detector
# tables (LIGO-T980044; LALDetectors.h).
DETECTORS = {
    "H1": Detector("H1", make_response_tensor(46.4552, -119.4077, 324.0006, 234.0006)),
    "L1": Detector("L1", make_response_tensor(30.5629, -90.7742, 252.2835, 162.2835)),
    "V1": Detector("V1", make_response_tensor(43.6314, 10.5045, 70.5674, 160.5674)),
}


def antenna_pattern(det: Detector, ra, dec, psi, gmst):
    """(F+, Fx) for batched sky positions.

    ``ra, dec, psi, gmst`` in radians, any (broadcastable) shape.  Convention:
    effective source longitude ℓ = ra − gmst in the Earth-fixed frame;
    polarization angle rotates the (north-on-sky, east-on-sky) basis.  Since
    the campaign draws psi uniformly the overall psi sign convention is
    statistically irrelevant.
    """
    ra, dec, psi, gmst = (jnp.asarray(x) for x in (ra, dec, psi, gmst))
    ell = ra - gmst
    sd, cd = jnp.sin(dec), jnp.cos(dec)
    sl, cl = jnp.sin(ell), jnp.cos(ell)

    # sky-local basis: n_hat to source, u along +dec (north), v along +ra (east)
    u = jnp.stack([-sd * cl, -sd * sl, cd], axis=-1)
    v = jnp.stack([-sl, cl, jnp.zeros_like(sl)], axis=-1)

    cp, sp = jnp.cos(psi)[..., None], jnp.sin(psi)[..., None]
    ex = u * cp + v * sp
    ey = -u * sp + v * cp

    d = jnp.asarray(det.response)
    dx = ex @ d  # (..., 3)
    dy = ey @ d
    fplus = jnp.sum(dx * ex, axis=-1) - jnp.sum(dy * ey, axis=-1)
    fcross = jnp.sum(dx * ey, axis=-1) + jnp.sum(dy * ex, axis=-1)
    return fplus, fcross
