"""Joint BBH population intensity over (m1, q, z) (L1).

    log dN/dm1 dq dV dt = log dN/dm(m1) + log dN/dm(m2 = q m1)
                        + beta * log[(m1+m2) / (MREF (1+QREF))]
                        + log m1                      (Jacobian dm2 -> dq)
                        + log dN/dV(z)

(cf. ``src/scripts/intensity_models.py:175-210``).  The mass-function table is
built once per hyperparameter draw and shared by both mass evaluations, every
event sample, every selection sample, and the posterior-predictive grids.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.models.mass import (
    DEFAULT_N_GRID,
    MREF,
    MassFunctionTable,
    build_mass_function,
    log_dndm,
)
from bumpcosmology_tpu.models.parameters import PopulationParams
from bumpcosmology_tpu.models.redshift import log_dndv

__all__ = ["QREF", "PopulationIntensity", "build_population", "log_dndmdqdv", "COORDS"]

QREF = 1.0  # pairing-function pivot mass ratio (``intensity_models.py:192``)


class PopulationIntensity(NamedTuple):
    """Per-draw population state: mass table + redshift/pairing parameters."""

    mass_table: MassFunctionTable
    params: PopulationParams


def build_population(params: PopulationParams, n_grid: int = DEFAULT_N_GRID) -> PopulationIntensity:
    """Build the per-draw population intensity (``LogDNDMDQDV.__post_init__``)."""
    return PopulationIntensity(mass_table=build_mass_function(params.mass, n_grid), params=params)


def log_dndmdqdv(pop, m1, q, z):
    """log dN/dm1/dq/dV/dt at (m1, q, z) (``intensity_models.py:202-210``).

    Accepts any intensity family: the PISN-bump :class:`PopulationIntensity`
    (handled inline below) or any other per-draw intensity pytree exposing a
    ``log_dndmdqdv(m1, q, z)`` method (e.g.
    :class:`~bumpcosmology_tpu.models.plpeak.PLPeakIntensity`) — dispatch
    happens at trace time, so the jitted potential sees only the chosen
    family's subgraph.

    For the bump family, the two mass-function evaluations (m1 and
    m2 = q·m1) are batched into a single stacked table lookup — one
    interpolation contraction instead of two on TPU.
    """
    if not isinstance(pop, PopulationIntensity):
        return pop.log_dndmdqdv(m1, q, z)
    m1 = jnp.asarray(m1)
    q = jnp.asarray(q)
    z = jnp.asarray(z)
    m2 = q * m1
    mt = m1 + m2
    beta = pop.params.mass.beta
    m1_b, m2_b = jnp.broadcast_arrays(m1, m2)
    both = log_dndm(pop.mass_table, jnp.stack([m1_b, m2_b]))
    return (
        both[0]
        + both[1]
        + beta * jnp.log(mt / (MREF * (1.0 + QREF)))
        + jnp.log(m1)
        + log_dndv(z, pop.params.redshift)
    )


# Posterior-predictive output grids (``intensity_models.py:275-279``): the
# deterministic rate curves recorded in the trace are evaluated on these axes.
COORDS = {
    "m_grid": np.exp(np.linspace(np.log(5.0), np.log(150.0), 128)),
    "q_grid": np.linspace(0.0, 1.0, 129)[1:],
    "z_grid": np.expm1(np.linspace(np.log1p(0.0), np.log1p(3.0), 128)),
}
