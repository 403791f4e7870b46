"""Device mesh construction: (chains, data) axes.

The reference's only device parallelism is numpyro's chain pmap over 8
emulated host devices (``src/scripts/run_fit.py:13,17``).  Here the mesh is
first-class and two-dimensional:

* ``chains`` — vectorized NUTS chains are sharded along this axis (pure data
  parallelism over chains; no communication inside a transition).
* ``data``  — the PE-sample and injection axes of the likelihood are sharded
  along this axis; the per-event and selection log-sum-exp reductions become
  ``psum``-carrying collectives that ride ICI (SURVEY.md §5 "long-context"
  equivalent).

O4-scale catalogs (1000 events x 16k samples) therefore never need the
subsampling the reference applies at ingestion (``draw_pe_samples.py:11``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["CHAIN_AXIS", "DATA_AXIS", "make_mesh", "replicated", "chain_sharding"]

CHAIN_AXIS = "chains"
DATA_AXIS = "data"


def make_mesh(
    n_chain_shards: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (chains, data) mesh over ``devices`` (default: all devices).

    ``n_chain_shards`` controls the factorization; by default a single chain
    row is used (all devices along ``data``), which is the right layout when
    chains fit on one chip and the likelihood data dominate memory.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_chain_shards is None:
        n_chain_shards = 1
    if n % n_chain_shards != 0:
        raise ValueError(f"{n} devices not divisible into {n_chain_shards} chain rows")
    arr = np.array(devices).reshape(n_chain_shards, n // n_chain_shards)
    return Mesh(arr, (CHAIN_AXIS, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-chain state arrays shaped (n_chains, ...)."""
    return NamedSharding(mesh, P(CHAIN_AXIS))
