"""Stable log-sum-exp reductions, local and mesh-sharded (L0).

The entire hierarchical likelihood of the reference is built out of
log-sum-exp reductions: the per-event Monte-Carlo marginal
(``src/scripts/intensity_models.py:335``), the selection integral (``:339``),
and their second-moment variants for the effective-sample-size guards
(``:342-351``).  On a TPU mesh these become *sharded* reductions: each device
reduces its local shard with a max-shifted sum, then the partial
``(max, sum)`` pairs are combined with ``psum``/``pmax`` over the mesh axis —
the same max-plus-accumulate trick as blockwise/streaming attention, so the
event/sample/injection axes can grow to O4 scale without ever being resident
on one chip.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = [
    "logsumexp",
    "logmeanexp",
    "sharded_logsumexp",
    "log_neff",
    "neff",
]


def logmeanexp(a: jnp.ndarray, axis=None) -> jnp.ndarray:
    """log of the mean of exp(a) along ``axis`` (stable)."""
    a = jnp.asarray(a)
    if axis is None:
        n = a.size
    else:
        n = a.shape[axis]
    return logsumexp(a, axis=axis) - jnp.log(jnp.asarray(n, dtype=a.dtype))


def sharded_logsumexp(a: jnp.ndarray, axis_name: str, axis=None) -> jnp.ndarray:
    """logsumexp over both the local ``axis`` and the mesh axis ``axis_name``.

    For use inside ``shard_map``: reduces the local shard, then combines
    shard partials with ``pmax``/``psum`` so the result equals the
    single-device logsumexp of the gathered array.  ``-inf`` shards (empty or
    fully masked) are handled without NaNs.
    """
    # The max shift is a constant w.r.t. differentiation (its gradient
    # contribution cancels exactly), and pmax has no VJP rule — stop_gradient
    # both keeps the math exact and makes the reduction differentiable.
    local_max = jax.lax.stop_gradient(jnp.max(a, axis=axis, keepdims=False))
    global_max = jax.lax.pmax(local_max, axis_name)
    safe_max = jnp.where(jnp.isfinite(global_max), global_max, 0.0)
    local_sum = jnp.sum(jnp.exp(a - jnp.expand_dims(safe_max, axis) if axis is not None else a - safe_max), axis=axis)
    global_sum = jax.lax.psum(local_sum, axis_name)
    return safe_max + jnp.log(global_sum)


def log_neff(log_wts: jnp.ndarray, axis=None, axis_name: Optional[str] = None) -> jnp.ndarray:
    """log of the importance-sampling effective sample size.

    ``Neff = (Σ w)² / Σ w²`` computed in log space:
    ``log_neff = 2·logsumexp(log w) − logsumexp(2·log w)``.

    Replaces the reference's per-event diagnostic
    (``intensity_models.py:351``) and the ingestion-time Neff guard
    (``weighting.py:98``).  With ``axis_name`` set, the reduction also spans
    the mesh axis (for sharded sample/injection axes).
    """
    if axis_name is None:
        return 2.0 * logsumexp(log_wts, axis=axis) - logsumexp(2.0 * log_wts, axis=axis)
    l1 = sharded_logsumexp(log_wts, axis_name, axis=axis)
    l2 = sharded_logsumexp(2.0 * log_wts, axis_name, axis=axis)
    return 2.0 * l1 - l2


def neff(log_wts: jnp.ndarray, axis=None, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Importance-sampling effective sample size (see :func:`log_neff`)."""
    return jnp.exp(log_neff(log_wts, axis=axis, axis_name=axis_name))
