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

__all__ = ["save_trace", "load_trace", "Trace", "to_arviz", "export_netcdf", "site_dims"]


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


# ---------------------------------------------------------------- arviz bridge

#: dims metadata for vector sites (used by the arviz export; the axes are the
#: posterior-predictive COORDS grids of ``models/population.py``)
SITE_DIMS = {
    "mdNdmdVdt_fixed_qz": ["m_grid"],
    "dNdqdVdt_fixed_mz": ["q_grid"],
    "dNdVdt_fixed_mq": ["z_grid"],
    "hz": ["z_grid"],
    "neff": ["event"],
}


def site_dims(trace: "Trace") -> Dict[str, list]:
    """Per-site trailing-dimension names for sites present in ``trace``."""
    out = {}
    for name, v in trace.posterior.items():
        if np.ndim(v) > 2:
            out[name] = SITE_DIMS.get(name, [f"{name}_dim0"])
    return out


def to_arviz(trace: "Trace"):
    """Convert to an ``arviz.InferenceData`` (optional dependency).

    The reference's outputs are arviz NetCDF traces (``run_fit.py:41-42``);
    users with an existing arviz workflow can round-trip through this bridge.
    arviz is intentionally not a hard dependency of the framework.
    """
    try:
        import arviz as az
    except ImportError as err:  # pragma: no cover - exercised only with arviz
        raise ImportError(
            "arviz is not installed. The native trace format is plain HDF5 "
            "(save_trace/load_trace; layout documented in utils/trace.py); "
            "install arviz to export InferenceData/NetCDF."
        ) from err

    coords = {k: np.asarray(v) for k, v in trace.coords.items()}
    nobs = None
    if "neff" in trace.posterior and np.ndim(trace.posterior["neff"]) == 3:
        nobs = trace.posterior["neff"].shape[-1]
        coords.setdefault("event", np.arange(nobs))
    return az.from_dict(
        posterior=trace.posterior,
        sample_stats=trace.sample_stats or None,
        coords=coords,
        dims=site_dims(trace),
    )


def _nc_group(f, name: str, variables: Dict[str, np.ndarray], coords, dims_map):
    """Write one InferenceData group as NetCDF-4 (pure h5py).

    NetCDF-4 files are HDF5 files following the dimension-scale conventions
    (each named dimension is a dataset with CLASS=DIMENSION_SCALE; variables
    carry DIMENSION_LIST references via ``attach_scale``) — exactly what
    netCDF4-c, h5netcdf, and therefore xarray/arviz read back.
    """
    g = f.create_group(name)
    first = next(iter(variables.values()))
    dim_sizes = {"chain": first.shape[0], "draw": first.shape[1]}
    for vname, v in variables.items():
        for ax, dim in enumerate(dims_map.get(vname, [])):
            dim_sizes[dim] = v.shape[2 + ax]

    scales = {}
    for dim, size in dim_sizes.items():
        vals = np.asarray(coords[dim]) if dim in coords else np.arange(size)
        ds = g.create_dataset(dim, data=vals)
        ds.make_scale(dim)
        scales[dim] = ds

    for vname, v in variables.items():
        v = np.asarray(v)
        ds = g.create_dataset(vname, data=v)
        var_dims = ["chain", "draw"] + list(dims_map.get(vname, []))
        for ax, dim in enumerate(var_dims):
            ds.dims[ax].attach_scale(scales[dim])


def export_netcdf(path, trace: "Trace") -> None:
    """Write an arviz-InferenceData-layout NetCDF-4 file with pure h5py.

    No arviz/netCDF4/h5netcdf dependency: the file is written directly with
    HDF5 dimension scales (the NetCDF-4 data model), with the ``posterior``
    and ``sample_stats`` groups and per-site dims of :data:`SITE_DIMS` —
    byte-compatible with ``arviz.from_netcdf`` / ``xarray.open_dataset(...,
    group="posterior", engine="h5netcdf")`` readers.  Equivalent surface to
    the reference's ``az.to_netcdf`` (``run_fit.py:41-42``).
    """
    dims_map = site_dims(trace)
    coords = {k: np.asarray(v) for k, v in trace.coords.items()}
    if "neff" in trace.posterior and np.ndim(trace.posterior["neff"]) == 3:
        coords.setdefault("event", np.arange(trace.posterior["neff"].shape[-1]))
    with h5py.File(path, "w") as f:
        f.attrs["inference_library"] = "bumpcosmology_tpu"
        _nc_group(f, "posterior", trace.posterior, coords, dims_map)
        if trace.sample_stats:
            _nc_group(f, "sample_stats", trace.sample_stats, coords, {})
