"""HDF5 trace container — the arviz/netCDF replacement (L4/L5).

The reference saves ``arviz.from_numpyro(mcmc)`` traces to NetCDF
(``src/scripts/run_fit.py:41-42``); arviz is not a dependency here, so traces
are stored as plain HDF5 with the same logical layout:

    /posterior/<site>      (chains, draws[, k])
    /sample_stats/<stat>   (chains, draws)
    /coords/<axis>         grid coordinates for vector sites
    attrs: framework version, creation metadata

Figure scripts and diagnostics read this format back via :func:`load_trace`.
"""
from __future__ import annotations

import json
from typing import Dict, Optional

import h5py
import numpy as np

__all__ = ["save_trace", "load_trace", "Trace"]


class Trace:
    """In-memory trace: posterior + sample_stats dicts of numpy arrays."""

    def __init__(
        self,
        posterior: Dict[str, np.ndarray],
        sample_stats: Optional[Dict[str, np.ndarray]] = None,
        coords: Optional[Dict[str, np.ndarray]] = None,
        attrs: Optional[Dict[str, str]] = None,
    ):
        self.posterior = dict(posterior)
        self.sample_stats = dict(sample_stats or {})
        self.coords = dict(coords or {})
        self.attrs = dict(attrs or {})

    def __getitem__(self, name: str) -> np.ndarray:
        return self.posterior[name]

    def stacked(self, name: str) -> np.ndarray:
        """Site flattened over (chains, draws)."""
        x = self.posterior[name]
        return x.reshape((-1,) + x.shape[2:])

    def summary(self):
        from bumpcosmology_tpu.inference.diagnostics import summary as _summary

        return _summary({k: v for k, v in self.posterior.items() if v.ndim == 2})


def save_trace(path, trace: Trace) -> None:
    with h5py.File(path, "w") as f:
        g = f.create_group("posterior")
        for k, v in trace.posterior.items():
            g.create_dataset(k, data=np.asarray(v))
        g = f.create_group("sample_stats")
        for k, v in trace.sample_stats.items():
            g.create_dataset(k, data=np.asarray(v))
        g = f.create_group("coords")
        for k, v in trace.coords.items():
            g.create_dataset(k, data=np.asarray(v))
        for k, v in trace.attrs.items():
            f.attrs[k] = v


def load_trace(path) -> Trace:
    with h5py.File(path, "r") as f:
        posterior = {k: np.asarray(v) for k, v in f["posterior"].items()}
        stats = {k: np.asarray(v) for k, v in f.get("sample_stats", {}).items()}
        coords = {k: np.asarray(v) for k, v in f.get("coords", {}).items()}
        attrs = {k: str(v) for k, v in f.attrs.items()}
    return Trace(posterior, stats, coords, attrs)
