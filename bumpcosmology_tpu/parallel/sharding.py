"""Sharded likelihood evaluation over the (chains, data) mesh.

Two complementary paths:

1. **GSPMD (default)** — :func:`shard_pop_data` / :func:`shard_pop_cosmo_data`
   place the event sample axis and the injection axis on the ``data`` mesh
   axis; the jitted potential then auto-partitions, with XLA inserting the
   max/sum collectives for the log-sum-exp reductions.

2. **Explicit shard_map** — :func:`make_sharded_pop_loglike` /
   :func:`make_sharded_pop_cosmo_loglike` spell the collectives out with
   :func:`~bumpcosmology_tpu.ops.logsumexp.sharded_logsumexp` (pmax + psum
   over ``data``), guaranteeing the communication layout.  Tests assert the
   two paths agree with the unsharded likelihood to float tolerance.

Hyperparameters and the per-draw bump/cosmology tables are replicated — they
are O(n_grid) scalars/vectors; the sharded axes carry all the data volume.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from bumpcosmology_tpu.inference.likelihoods import (
    PopCosmoData,
    PopData,
    _cosmo_frame_logwts,
    _pop_event_sel_logwts,
    population_from_sites,
    cosmo_from_sites,
)
from bumpcosmology_tpu.models.cosmology import build_cosmology
from bumpcosmology_tpu.models.mass import DEFAULT_N_GRID
from bumpcosmology_tpu.models.population import build_population, log_dndmdqdv
from bumpcosmology_tpu.ops.logsumexp import sharded_logsumexp
from bumpcosmology_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "pop_data_pspecs",
    "pop_cosmo_data_pspecs",
    "shard_pop_data",
    "shard_pop_cosmo_data",
    "make_sharded_pop_loglike",
    "make_sharded_pop_cosmo_loglike",
]


def _event_sel_pspecs(data):
    """Sample axis of events and the injection axis sharded over ``data``."""
    ev_spec = data.events._replace(
        a=P(None, DATA_AXIS), q=P(None, DATA_AXIS), c=P(None, DATA_AXIS), log_pdraw=P(None, DATA_AXIS)
    )
    sel_spec = data.selection._replace(
        a=P(DATA_AXIS), q=P(DATA_AXIS), c=P(DATA_AXIS), log_pdraw=P(DATA_AXIS), log_ndraw=P()
    )
    return ev_spec, sel_spec


def pop_data_pspecs(data: PopData):
    ev, sel = _event_sel_pspecs(data)
    planck = data.planck._replace(u0=P(), du=P(), log_dv=P(None))
    return PopData(events=ev, selection=sel, planck=planck)


def pop_cosmo_data_pspecs(data: PopCosmoData):
    ev, sel = _event_sel_pspecs(data)
    return PopCosmoData(events=ev, selection=sel)


def _device_put_tree(data, pspecs, mesh: Mesh):
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)), data, pspecs
    )


def shard_pop_data(data: PopData, mesh: Mesh) -> PopData:
    """Place PopData on the mesh (GSPMD path).  Sample/injection axes must be
    divisible by the ``data`` mesh-axis size."""
    return _device_put_tree(data, pop_data_pspecs(data), mesh)


def shard_pop_cosmo_data(data: PopCosmoData, mesh: Mesh) -> PopCosmoData:
    return _device_put_tree(data, pop_cosmo_data_pspecs(data), mesh)


# ---------------------------------------------------------------------------
# Explicit shard_map likelihoods
# ---------------------------------------------------------------------------


def make_sharded_pop_loglike(
    mesh: Mesh, data: PopData, n_grid: int = DEFAULT_N_GRID
) -> Callable:
    """Population-only log-likelihood with explicit ``data``-axis collectives.

    Each shard holds (nobs, nsamp/k) PE samples and (nsel/k) injections,
    rebuilds the (replicated) bump table, reduces its local weights, and
    combines with pmax/psum — a streaming blockwise logsumexp over the mesh.
    """
    nobs, nsamp = data.events.a.shape
    pspecs = pop_data_pspecs(data)

    def local(sites, d: PopData):
        pop = build_population(population_from_sites(sites), n_grid)
        ev, sel = d.events, d.selection
        log_wts = (
            log_dndmdqdv(pop, ev.a, ev.q, ev.c) + d.planck.log_dvdz_dt(ev.c) - ev.log_pdraw
        )
        log_like = sharded_logsumexp(log_wts, DATA_AXIS, axis=1) - math.log(nsamp)
        log_sel_wts = (
            log_dndmdqdv(pop, sel.a, sel.q, sel.c) + d.planck.log_dvdz_dt(sel.c) - sel.log_pdraw
        )
        log_mu_sel = sharded_logsumexp(log_sel_wts, DATA_AXIS) - sel.log_ndraw
        return jnp.sum(log_like) - nobs * log_mu_sel

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), pspecs),
        out_specs=P(),
    )

    def loglike(sites, d: PopData = data):
        return sharded(sites, d)

    return loglike


def make_sharded_pop_cosmo_loglike(
    mesh: Mesh, data: PopCosmoData, n_grid: int = DEFAULT_N_GRID, n_z: int = 1024
) -> Callable:
    """Joint population+cosmology log-likelihood with explicit collectives.

    The per-draw cosmology table (1024-pt cumtrapz) is rebuilt on every shard
    (replicated compute, O(n_z) work) while the detector-frame sample and
    injection batches stay sharded.
    """
    nobs, nsamp = data.events.a.shape
    pspecs = pop_cosmo_data_pspecs(data)

    def local(sites, d: PopCosmoData):
        pop = build_population(population_from_sites(sites), n_grid)
        cosmo = build_cosmology(cosmo_from_sites(sites), n=n_z)
        ev, sel = d.events, d.selection
        log_wts = _cosmo_frame_logwts(pop, cosmo, ev.a, ev.q, ev.c, ev.log_pdraw)
        log_like = sharded_logsumexp(log_wts, DATA_AXIS, axis=1) - math.log(nsamp)
        log_sel_wts = _cosmo_frame_logwts(pop, cosmo, sel.a, sel.q, sel.c, sel.log_pdraw)
        log_mu_sel = sharded_logsumexp(log_sel_wts, DATA_AXIS) - sel.log_ndraw
        return jnp.sum(log_like) - nobs * log_mu_sel

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), pspecs),
        out_specs=P(),
    )

    def loglike(sites, d: PopCosmoData = data):
        return sharded(sites, d)

    return loglike
