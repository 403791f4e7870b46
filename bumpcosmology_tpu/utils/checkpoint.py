"""Mid-MCMC checkpoint/resume (L4).

The reference has only artifact-level recovery — a killed fit restarts from
scratch (SURVEY.md §5).  Here the adapted sampler state (chain positions,
step sizes, dense mass matrices) round-trips through a plain ``.npz`` file,
so a fit can resume sampling without re-running warmup.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference.nuts import ChainState, WarmupResult

__all__ = ["checkpoint_file", "save_warmup", "load_warmup"]


def checkpoint_file(path) -> str:
    """The on-disk filename for a checkpoint path.

    ``np.savez`` silently appends ``.npz`` to paths lacking the suffix; every
    caller (save, load, existence checks in ``fit``) must agree on the
    normalized name or resume never triggers.
    """
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_warmup(path, warm: WarmupResult) -> None:
    np.savez(
        checkpoint_file(path),
        theta=np.asarray(warm.state.theta),
        u=np.asarray(warm.state.u),
        grad=np.asarray(warm.state.grad),
        eps=np.asarray(warm.eps),
        cov=np.asarray(warm.cov),
        chol_cov=np.asarray(warm.chol_cov),
    )


def load_warmup(path) -> WarmupResult:
    with np.load(checkpoint_file(path)) as d:
        state = ChainState(
            theta=jnp.asarray(d["theta"]),
            u=jnp.asarray(d["u"]),
            grad=jnp.asarray(d["grad"]),
        )
        return WarmupResult(
            state=state,
            eps=jnp.asarray(d["eps"]),
            cov=jnp.asarray(d["cov"]),
            chol_cov=jnp.asarray(d["chol_cov"]),
        )
