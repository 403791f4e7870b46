"""Minimal distribution library for hyperpriors (L2).

numpyro is not part of this framework's dependency set; the reference's
hyperpriors (``src/scripts/intensity_models.py:281-311``) use exactly three
families — Normal, TruncatedNormal, Uniform — so we implement them directly,
together with the bijections to unconstrained space that the NUTS sampler
needs.  All log-densities are stable in float32 (``log_ndtr``-based truncated
normalization, softplus/sigmoid interval transforms).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtri

__all__ = ["Normal", "TruncatedNormal", "Uniform", "Distribution"]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class Normal(NamedTuple):
    loc: float = 0.0
    scale: float = 1.0

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - _LOG_SQRT_2PI - jnp.log(jnp.asarray(self.scale, dtype=jnp.result_type(x)))

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)

    # --- unconstrained bijection: identity -------------------------------
    def unconstrain(self, x):
        return x

    def constrain(self, u):
        return u

    def constrain_log_jac(self, u):
        return jnp.zeros_like(u)


class Uniform(NamedTuple):
    low: float
    high: float

    def log_prob(self, x):
        width = self.high - self.low
        in_support = (x >= self.low) & (x <= self.high)
        return jnp.where(in_support, -jnp.log(width), -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)

    # --- unconstrained bijection: scaled sigmoid --------------------------
    def unconstrain(self, x):
        p = (x - self.low) / (self.high - self.low)
        p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
        return jnp.log(p) - jnp.log1p(-p)

    def constrain(self, u):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(u)

    def constrain_log_jac(self, u):
        # log |dx/du| = log(width) + log sigmoid(u) + log sigmoid(-u)
        return (
            jnp.log(self.high - self.low)
            - jax.nn.softplus(-u)
            - jax.nn.softplus(u)
        )


class TruncatedNormal(NamedTuple):
    """Normal(loc, scale) truncated to [low, high] (either side optional).

    Matches numpyro's ``dist.TruncatedNormal`` semantics as used by the
    reference hyperpriors (``intensity_models.py:282-310``).
    """

    loc: float
    scale: float
    low: Optional[float] = None
    high: Optional[float] = None

    def _log_z(self, dtype):
        """log of the truncation normalization P(low < X < high)."""
        if self.low is None and self.high is None:
            return jnp.asarray(0.0, dtype)
        if self.high is None:
            alpha = (self.low - self.loc) / self.scale
            return log_ndtr(jnp.asarray(-alpha, dtype))  # P(X > low)
        if self.low is None:
            beta = (self.high - self.loc) / self.scale
            return log_ndtr(jnp.asarray(beta, dtype))
        alpha = (self.low - self.loc) / self.scale
        beta = (self.high - self.loc) / self.scale
        # log(Phi(beta) - Phi(alpha)), stable via the smaller tail
        la, lb = log_ndtr(jnp.asarray(alpha, dtype)), log_ndtr(jnp.asarray(beta, dtype))
        return lb + jnp.log1p(-jnp.exp(la - lb))

    def log_prob(self, x):
        dtype = jnp.result_type(x, jnp.float32)
        z = (x - self.loc) / self.scale
        lp = -0.5 * z * z - _LOG_SQRT_2PI - jnp.log(jnp.asarray(self.scale, dtype)) - self._log_z(dtype)
        lo = -jnp.inf if self.low is None else self.low
        hi = jnp.inf if self.high is None else self.high
        return jnp.where((x >= lo) & (x <= hi), lp, -jnp.inf)

    def sample(self, key, shape=()):
        dtype = jnp.float32
        lo_u = 0.0 if self.low is None else jax.scipy.special.ndtr((self.low - self.loc) / self.scale)
        hi_u = 1.0 if self.high is None else jax.scipy.special.ndtr((self.high - self.loc) / self.scale)
        u = jax.random.uniform(key, shape, minval=lo_u, maxval=hi_u, dtype=dtype)
        u = jnp.clip(u, 1e-6, 1.0 - 1e-6)
        return self.loc + self.scale * ndtri(u)

    # --- unconstrained bijection ------------------------------------------
    # Two-sided: interval sigmoid.  One-sided low: exp-shift.  Untruncated:
    # identity.  (Same scheme numpyro's biject_to registry would pick.)
    def unconstrain(self, x):
        if self.low is not None and self.high is not None:
            p = (x - self.low) / (self.high - self.low)
            p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            return jnp.log(p) - jnp.log1p(-p)
        if self.low is not None:
            return jnp.log(jnp.maximum(x - self.low, 1e-10))
        if self.high is not None:
            return jnp.log(jnp.maximum(self.high - x, 1e-10))
        return x

    def constrain(self, u):
        if self.low is not None and self.high is not None:
            return self.low + (self.high - self.low) * jax.nn.sigmoid(u)
        if self.low is not None:
            return self.low + jnp.exp(u)
        if self.high is not None:
            return self.high - jnp.exp(u)
        return u

    def constrain_log_jac(self, u):
        if self.low is not None and self.high is not None:
            return (
                jnp.log(self.high - self.low)
                - jax.nn.softplus(-u)
                - jax.nn.softplus(u)
            )
        if self.low is not None or self.high is not None:
            return u
        return jnp.zeros_like(u)


Distribution = (Normal, Uniform, TruncatedNormal)
