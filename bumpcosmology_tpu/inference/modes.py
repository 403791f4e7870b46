"""First-class multimodality: mode assignment, per-mode diagnostics, weights.

Round-4 handled the PLPeak joint fit's bimodality by hand: chains were
initialized in the dominant mode and the secondary mode was recorded in a
trace attribute.  This module replaces the hand-seeding with machinery:

1. fit from *prior-overdispersed* inits across many chains (the sampler's
   standard ``_finite_prior_init`` is already overdispersed — no seeding);
2. :func:`assign_modes` clusters the chains into modes by their posterior
   means, in within-chain-sd units (agglomerative single-linkage — no k
   chosen a priori);
3. :func:`split_rhat_per_mode` computes convergence diagnostics *within*
   each mode, where mixing is actually expected (cross-mode R-hat only
   measures the chains' inability to jump — real NUTS behaviour on
   19-nat-separated basins, not non-convergence);
4. :func:`mode_weights_by_bridge` estimates each mode's evidence with the
   existing bridge sampler (mode-local moment-matched Gaussian proposal) →
   posterior mode weights, and a mode-weighted resampled posterior.

The reference never faced this (its fits are single-basin,
``run_fit.py:37-39``); wide vectorized chain batches are exactly where the
TPU design finds additional structure the 4-chain reference cannot see.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

__all__ = [
    "assign_modes",
    "split_rhat_per_mode",
    "mode_weights_by_bridge",
    "mode_weighted_resample",
]


def _chain_stats(posterior: Dict[str, np.ndarray], names: List[str]):
    """Per-chain means and pooled within-chain sds, stacked (chains, sites)."""
    means = np.stack(
        [np.asarray(posterior[k], dtype=np.float64).mean(axis=1) for k in names], axis=1
    )
    sds = np.stack(
        [np.asarray(posterior[k], dtype=np.float64).std(axis=1, ddof=1) for k in names],
        axis=1,
    )
    pooled = np.sqrt(np.mean(sds**2, axis=0))  # (sites,)
    return means, np.maximum(pooled, 1e-12)


def assign_modes(
    posterior: Dict[str, np.ndarray],
    names: Optional[List[str]] = None,
    threshold: float = 4.0,
) -> np.ndarray:
    """Cluster chains into modes; returns an int label per chain (0-based,
    ordered by descending mode size).

    Two chains belong to the same mode when their posterior means differ by
    less than ``threshold`` pooled within-chain standard deviations in SOME
    connected path (single-linkage agglomeration on the standardized
    chain-mean distance matrix).  Chains exploring one basin sit within
    ~1 sd/sqrt(ess) of each other, far below any sensible threshold; basins
    separated enough to trap NUTS sit many sds apart — the clustering is
    threshold-insensitive over a wide range (2-10).
    """
    names = names or sorted(posterior)
    means, pooled = _chain_stats(posterior, names)
    z = means / pooled  # standardized chain means
    n = z.shape[0]
    # single-linkage union-find on pairwise distances
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    d = np.sqrt(((z[:, None, :] - z[None, :, :]) ** 2).mean(axis=2))
    for i in range(n):
        for j in range(i + 1, n):
            if d[i, j] < threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    roots = np.array([find(i) for i in range(n)])
    labels_raw, counts = np.unique(roots, return_counts=True)
    order = labels_raw[np.argsort(-counts)]
    remap = {r: m for m, r in enumerate(order)}
    return np.array([remap[r] for r in roots], dtype=int)


def split_rhat_per_mode(
    posterior: Dict[str, np.ndarray], labels: np.ndarray
) -> Dict[int, Dict[str, float]]:
    """Max split-R-hat and min ESS per mode (over all sites).

    Modes with a single chain report R-hat from that chain's two halves
    (split-chain definition still applies).
    """
    from bumpcosmology_tpu.inference.diagnostics import ess as _ess
    from bumpcosmology_tpu.inference.diagnostics import split_rhat as _rhat

    out: Dict[int, Dict[str, float]] = {}
    for m in np.unique(labels):
        idx = np.flatnonzero(labels == m)
        rmax, emin = 0.0, np.inf
        for k, v in posterior.items():
            arr = np.asarray(v)[idx]
            rmax = max(rmax, float(_rhat(arr)))
            emin = min(emin, float(_ess(arr)))
        out[int(m)] = {"max_rhat": rmax, "min_ess": emin, "n_chains": len(idx)}
    return out


def mode_weights_by_bridge(
    spec,
    posterior: Dict[str, np.ndarray],
    labels: np.ndarray,
    seed: int = 0,
    **bridge_kwargs,
):
    """Per-mode bridge-sampling evidence → posterior mode weights.

    Each mode's draws feed :func:`~bumpcosmology_tpu.inference.evidence.
    log_evidence_bridge` separately; the moment-matched Gaussian proposal is
    then mode-local, so the estimate is that basin's contribution Z_m to the
    total evidence (cross-basin contamination of the proposal is e^{-dz}
    suppressed for basins dz nats apart).  Weights w_m = Z_m / sum Z_m.

    Returns ``(weights, results)``: (n_modes,) float weights and the per-mode
    EvidenceResult list (log Z_m with MC error).  Modes too small for the
    bridge (< 64 draws) get weight 0 with a None result — a 1-chain
    splinter carries no measurable mass anyway.
    """
    from bumpcosmology_tpu.inference.evidence import log_evidence_bridge

    modes = np.unique(labels)
    results = []
    logzs = []
    for m in modes:
        idx = np.flatnonzero(labels == m)
        sub = {k: np.asarray(v)[idx] for k, v in posterior.items() if k in spec.priors}
        try:
            res = log_evidence_bridge(spec, sub, seed=seed + int(m), **bridge_kwargs)
            results.append(res)
            logzs.append(res.log_z)
        except ValueError:
            results.append(None)
            logzs.append(-np.inf)
    logzs = np.asarray(logzs, dtype=np.float64)
    mx = np.max(logzs)
    w = np.exp(logzs - mx)
    return w / w.sum(), results


def mode_weighted_resample(
    posterior: Dict[str, np.ndarray],
    labels: np.ndarray,
    weights: np.ndarray,
    n_out: int,
    rng: np.random.Generator,
) -> Dict[str, np.ndarray]:
    """A single mode-weighted posterior sample: draws resampled from each
    mode's pool in proportion to its bridge weight (shape (1, n_out) per
    site, arviz-style)."""
    modes = np.unique(labels)
    counts = rng.multinomial(n_out, np.asarray(weights) / np.sum(weights))
    out = {k: [] for k in posterior}
    for m, c in zip(modes, counts):
        if c == 0:
            continue
        idx = np.flatnonzero(labels == m)
        pool = {k: np.asarray(v)[idx].reshape(-1) for k, v in posterior.items()}
        npool = pool[next(iter(pool))].shape[0]
        pick = rng.choice(npool, size=c, replace=True)
        for k in out:
            out[k].append(pool[k][pick])
    return {k: np.concatenate(v)[None, :] for k, v in out.items()}
