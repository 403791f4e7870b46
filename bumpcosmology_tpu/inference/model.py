"""Model specification: priors + log-likelihood → potential function (L2).

The equivalent of numpyro's trace/substitute machinery for this framework's
model family: every sampled site is a scalar with one of the three prior
families in :mod:`bumpcosmology_tpu.inference.distributions`.  A model is

    ModelSpec(priors = {name: Distribution}, loglike = params_dict -> scalar)

and :func:`make_potential` compiles it into the flat-vector potential

    U(theta) = -[ sum_i log p_i(x_i) + log|J(theta)| + loglike(x) ]

that the NUTS engine consumes.  Keeping theta a flat vector (the model family
has 12-17 scalar hyperparameters, cf. ``intensity_models.py:281-311``) makes
dense-mass NUTS a plain matrix algebra problem and keeps the TPU compute path
free of pytree overhead.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ModelSpec", "make_potential", "prior_sample", "constrain", "unconstrain"]


class ModelSpec(NamedTuple):
    """A probabilistic model: ordered scalar priors + a log-likelihood."""

    priors: Dict[str, object]  # name -> Distribution (insertion-ordered)
    loglike: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray]

    @property
    def names(self) -> Tuple[str, ...]:
        return tuple(self.priors.keys())

    @property
    def dim(self) -> int:
        return len(self.priors)


def constrain(spec: ModelSpec, theta: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Map an unconstrained flat vector to the constrained parameter dict."""
    return {
        name: dist.constrain(theta[..., i])
        for i, (name, dist) in enumerate(spec.priors.items())
    }


def unconstrain(spec: ModelSpec, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Map a constrained parameter dict to the unconstrained flat vector."""
    return jnp.stack(
        [jnp.asarray(dist.unconstrain(params[name])) for name, dist in spec.priors.items()],
        axis=-1,
    )


def _log_prior_and_jac(spec: ModelSpec, theta: jnp.ndarray) -> jnp.ndarray:
    total = jnp.asarray(0.0, dtype=theta.dtype)
    for i, (name, dist) in enumerate(spec.priors.items()):
        u = theta[..., i]
        x = dist.constrain(u)
        total = total + dist.log_prob(x) + dist.constrain_log_jac(u)
    return total


def make_potential(spec: ModelSpec) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build U(theta) = -log posterior density over unconstrained theta."""

    def potential(theta: jnp.ndarray) -> jnp.ndarray:
        params = constrain(spec, theta)
        lp = _log_prior_and_jac(spec, theta)
        ll = spec.loglike(params)
        return -(lp + ll)

    return potential


def prior_sample(spec: ModelSpec, key, shape=()) -> jnp.ndarray:
    """Draw from the prior, returned in *unconstrained* space (chain init).

    Matches the role of numpyro's ``init_to_sample`` strategy.
    """
    keys = jax.random.split(key, spec.dim)
    us = []
    for k, (name, dist) in zip(keys, spec.priors.items()):
        x = dist.sample(k, shape)
        us.append(jnp.asarray(dist.unconstrain(x)))
    return jnp.stack(us, axis=-1)
