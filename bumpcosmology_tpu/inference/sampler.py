"""High-level fit driver: ModelSpec → posterior trace (L4).

The equivalent of the reference's ``NUTS(...); MCMC(...); mcmc.run(...)``
sequence (``src/scripts/run_fit.py:35-39``) with the TPU-native extras the
reference lacks:

* vectorized chains (vmap; hundreds of chains batch on one chip),
* per-phase wall-clock + ESS/sec reporting,
* warmup-state checkpointing for mid-MCMC resume,
* deterministic-site reconstruction as a separate batched post-pass
  (keeps the NUTS hot loop free of predictive-grid work).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bumpcosmology_tpu.inference.diagnostics import summary
from bumpcosmology_tpu.inference.model import ModelSpec, constrain, make_potential, prior_sample
from bumpcosmology_tpu.inference.nuts import (
    NutsConfig,
    WarmupResult,
    run_sampling,
    run_warmup,
)

__all__ = ["FitResult", "fit", "compute_deterministics"]


def _finite_prior_init(spec, potential, key, num_chains, max_tries: int = 50):
    """Prior-sample chain initializations, redrawn until the potential is
    finite for every chain.

    A prior draw can land where the likelihood is exactly zero (e.g. mass
    hyperparameters placing all PE samples outside the bump support, giving
    a -inf event marginal); starting NUTS there makes H0 infinite and every
    energy difference NaN.  numpyro's init_to_sample does the same redraw.
    """
    pot_batch = jax.jit(jax.vmap(potential))
    theta = jax.vmap(lambda k: prior_sample(spec, k))(jax.random.split(key, num_chains))
    for _ in range(max_tries):
        u = pot_batch(theta)
        bad = ~np.isfinite(np.asarray(u))
        if not bad.any():
            return theta
        key, k = jax.random.split(key)
        fresh = jax.vmap(lambda kk: prior_sample(spec, kk))(jax.random.split(k, num_chains))
        theta = jnp.where(jnp.asarray(bad)[:, None], fresh, theta)
    raise RuntimeError(
        f"could not find finite-potential initializations for {int(bad.sum())} "
        f"chain(s) after {max_tries} prior redraws — check the model/data"
    )


class FitResult(NamedTuple):
    posterior: Dict[str, np.ndarray]  # site -> (chains, draws) or (chains, draws, k)
    sample_stats: Dict[str, np.ndarray]
    warmup_state: WarmupResult  # adapted state (checkpointable)
    final_state: WarmupResult  # post-sampling state (for continuation)
    timings: Dict[str, float]

    def summary(self):
        return summary({k: v for k, v in self.posterior.items() if np.ndim(v) == 2})


def compute_deterministics(
    spec: ModelSpec,
    theta: jnp.ndarray,  # (chains, draws, dim)
    det_fn: Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]],
    batch_size: int = 128,
) -> Dict[str, np.ndarray]:
    """Vectorized post-pass computing deterministic sites for every draw."""
    nchains, ndraws, dim = theta.shape
    flat = theta.reshape(nchains * ndraws, dim)

    def one(t):
        return det_fn(constrain(spec, t))

    out = jax.lax.map(one, flat, batch_size=batch_size)
    return {
        k: np.asarray(v).reshape((nchains, ndraws) + v.shape[1:]) for k, v in out.items()
    }


def _fit_chees(spec, potential, k_init, k_run, num_warmup, num_samples, num_chains,
               deterministics_fn, verbose):
    """ChEES-HMC backend for :func:`fit` (fixed-length jittered HMC with
    cross-chain trajectory adaptation — see inference.chees)."""
    from bumpcosmology_tpu.inference.chees import run_chees

    timings: Dict[str, float] = {}
    init_theta = _finite_prior_init(spec, potential, k_init, num_chains)
    t0 = time.perf_counter()
    res = run_chees(
        potential, init_theta, k_run, num_warmup=num_warmup, num_samples=num_samples,
        verbose=verbose,
    )
    jax.block_until_ready(res.thetas)
    timings["sampling_s"] = time.perf_counter() - t0

    posterior = {name: np.asarray(v) for name, v in constrain(spec, res.thetas).items()}
    sample_stats = {
        "accept_prob": np.asarray(res.accept),
        "diverging": np.asarray(res.diverging),
        "n_leapfrog": np.full_like(np.asarray(res.accept), res.n_leapfrog),
    }
    if deterministics_fn is not None:
        posterior.update(compute_deterministics(spec, res.thetas, deterministics_fn))
    if verbose:
        total = num_chains * num_samples
        print(f"[fit/chees] {total} draws in {timings['sampling_s']:.1f}s "
              f"({res.n_leapfrog} leapfrogs/draw, eps={float(res.eps):.4g})")
    return FitResult(
        posterior=posterior,
        sample_stats=sample_stats,
        warmup_state=res.warm,
        final_state=res.warm,
        timings=timings,
    )


def fit(
    spec: ModelSpec,
    key: jnp.ndarray,
    num_warmup: int = 1000,
    num_samples: int = 1000,
    num_chains: int = 4,
    cfg: NutsConfig = NutsConfig(),
    deterministics_fn: Optional[Callable] = None,
    init_theta: Optional[jnp.ndarray] = None,
    warmup_state: Optional[WarmupResult] = None,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    sampler: str = "nuts",
    warmup_chunk_size: Optional[int] = None,
    chees_num_adapt: int = 150,
    verbose: bool = True,
) -> FitResult:
    """Run NUTS on ``spec``; returns constrained posterior + stats + states.

    ``sampler``: ``"nuts"`` (default), ``"chees"`` (self-contained ChEES-HMC,
    see :func:`_fit_chees`), or ``"nuts+chees"`` — NUTS windowed warmup, then
    ChEES trajectory-length adaptation (``chees_num_adapt`` iterations) and a
    fixed-length jittered-HMC sampling phase.  The hybrid is the production
    TPU configuration: vectorized NUTS pays a ragged-tree tax in the sampling
    phase that fixed-length trajectories avoid (measured ~1.7x draw
    throughput at 16 chains on the flagship joint fit).

    ``warmup_state`` (from a previous :class:`FitResult`) skips adaptation —
    the resume path the reference lacks (SURVEY.md §5 checkpoint/resume).
    Warmup checkpointing (``checkpoint_path``) applies to every sampler;
    mid-sampling chunk checkpoints are NUTS-only (the hybrid's sampling
    phase is cheap enough to restart from its warmup checkpoint).

    With ``mesh`` given, the chain batch is sharded along the ``chains`` mesh
    axis (the data inside ``spec``'s closure should already be placed with
    :func:`bumpcosmology_tpu.parallel.shard_pop_data` /
    ``shard_pop_cosmo_data``); XLA then partitions every transition across
    the mesh.
    """
    potential = make_potential(spec)
    k_init, k_warm, k_sample = jax.random.split(key, 3)

    if sampler == "chees":
        return _fit_chees(
            spec, potential, k_init, k_warm, num_warmup, num_samples, num_chains,
            deterministics_fn, verbose,
        )
    if sampler not in ("nuts", "nuts+chees"):
        raise ValueError(
            f"unknown sampler {sampler!r}; use 'nuts', 'chees', or 'nuts+chees'"
        )

    timings: Dict[str, float] = {}
    if warmup_state is None and checkpoint_path is not None:
        import os

        from bumpcosmology_tpu.utils.checkpoint import checkpoint_file

        if os.path.exists(checkpoint_file(checkpoint_path)):
            from bumpcosmology_tpu.utils.checkpoint import load_warmup

            warmup_state = load_warmup(checkpoint_path)
            if verbose:
                print(f"[fit] resuming from warmup checkpoint {checkpoint_path}")
    if warmup_state is None:
        if init_theta is None:
            init_theta = _finite_prior_init(spec, potential, k_init, num_chains)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from bumpcosmology_tpu.parallel.mesh import CHAIN_AXIS

            init_theta = jax.device_put(
                init_theta, NamedSharding(mesh, P(CHAIN_AXIS))
            )
        t0 = time.perf_counter()
        progress = None
        if verbose:
            def progress(step, total, accept):
                if step % 100 == 0 or step == total:
                    print(
                        f"[fit] warmup {step}/{total} "
                        f"(accept {accept:.2f}, {time.perf_counter() - t0:.0f}s)",
                        flush=True,
                    )
        warm, _ = run_warmup(
            potential, init_theta, k_warm, num_warmup, cfg,
            progress=progress, chunk_size=warmup_chunk_size,
        )
        jax.block_until_ready(warm.state.theta)
        timings["warmup_s"] = time.perf_counter() - t0
        if verbose:
            print(f"[fit] warmup: {num_warmup} steps x {num_chains} chains in {timings['warmup_s']:.1f}s")
        if checkpoint_path is not None:
            from bumpcosmology_tpu.utils.checkpoint import save_warmup

            save_warmup(checkpoint_path, warm)
            if verbose:
                print(f"[fit] warmup checkpoint saved to {checkpoint_path}")
    else:
        warm = warmup_state

    if sampler == "nuts+chees":
        # Production TPU configuration: NUTS-quality windowed adaptation
        # (above), then fixed-length jittered HMC for the sampling phase —
        # vectorized NUTS pays a ragged-tree tax (every lockstep chain batch
        # runs at the deepest chain's trajectory cost) that fixed-length
        # trajectories avoid entirely.  Only the trajectory length is
        # ChEES-adapted on top of the NUTS (eps, mass).
        from bumpcosmology_tpu.inference.chees import run_chees_from_warmup

        t0 = time.perf_counter()
        res = run_chees_from_warmup(
            potential, warm, k_sample, num_adapt=chees_num_adapt,
            num_samples=num_samples, verbose=verbose,
        )
        jax.block_until_ready(res.thetas)
        timings["sampling_s"] = time.perf_counter() - t0
        thetas = res.thetas
        final = res.warm
        posterior = {
            name: np.asarray(vals) for name, vals in constrain(spec, thetas).items()
        }
        acc = np.asarray(res.accept)
        sample_stats = {
            "accept_prob": acc,
            "diverging": np.asarray(res.diverging),
            "n_leapfrog": np.full_like(acc, res.n_leapfrog),
        }
    else:
        t0 = time.perf_counter()
        sample_progress = None
        if verbose:
            def sample_progress(done, total):
                if done % 100 == 0 or done == total:
                    print(
                        f"[fit] sampling {done}/{total} ({time.perf_counter() - t0:.0f}s)",
                        flush=True,
                    )
        thetas, stats, final = run_sampling(
            potential, warm, k_sample, num_samples, cfg, progress=sample_progress,
            checkpoint_path=checkpoint_path,
        )
        jax.block_until_ready(thetas)
        timings["sampling_s"] = time.perf_counter() - t0

        posterior = {
            name: np.asarray(vals)
            for name, vals in constrain(spec, thetas).items()
        }
        sample_stats = {
            "accept_prob": np.asarray(stats.accept_prob),
            "diverging": np.asarray(stats.diverging),
            "tree_depth": np.asarray(stats.tree_depth),
            "n_leapfrog": np.asarray(stats.n_leapfrog),
            "potential_energy": np.asarray(stats.energy),
            "step_size": np.asarray(stats.step_size),
        }

    if deterministics_fn is not None:
        t0 = time.perf_counter()
        det = compute_deterministics(spec, thetas, deterministics_fn)
        timings["deterministics_s"] = time.perf_counter() - t0
        posterior.update(det)

    if verbose:
        total = num_chains * num_samples
        sam_s = timings["sampling_s"]
        scalar = {k: v for k, v in posterior.items() if np.ndim(v) == 2}
        ess_min = min(s["ess"] for s in summary(scalar).values()) if scalar else float("nan")
        div = sample_stats.get("diverging")
        div_note = f"divergences {div.sum():.0f}" if div is not None else "fixed-length HMC"
        print(
            f"[fit] sampling: {total} draws in {sam_s:.1f}s "
            f"({total / sam_s:.1f} draws/s, min-ESS/s {ess_min / sam_s:.2f}, "
            f"{div_note})"
        )
    if "selection_noise_nats" in posterior:
        noise = float(np.median(posterior["selection_noise_nats"]))
        if verbose:
            print(f"[fit] selection-integral MC noise: {noise:.2f} nats (median)")
        if noise > 1.0:
            import warnings

            warnings.warn(
                f"selection-integral MC noise {noise:.2f} nats > 1.0: the "
                "posterior itself is likely corrupted by pseudo-modes from "
                "the finite injection set — increase the number of selection "
                "injections (docs/DESIGN.md §5a)",
                stacklevel=2,
            )

    return FitResult(
        posterior=posterior,
        sample_stats=sample_stats,
        warmup_state=warm,
        final_state=final,
        timings=timings,
    )
