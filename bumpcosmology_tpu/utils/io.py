"""Column-table HDF5 I/O (pytables-free).

The reference stores pipeline artifacts with ``pandas.to_hdf`` (pytables);
pytables is not in this environment, so DataFrames are stored as plain h5py
column datasets under a named group — same artifact role, dependency-free.
"""
from __future__ import annotations

import h5py
import numpy as np
import pandas as pd

__all__ = ["write_table", "read_table"]


def write_table(path, df: pd.DataFrame, key: str = "samples", mode: str = "w") -> None:
    with h5py.File(path, mode) as f:
        if key in f:
            del f[key]
        g = f.create_group(key)
        g.attrs["columns"] = list(df.columns)
        for col in df.columns:
            vals = df[col].to_numpy()
            if vals.dtype == object:
                vals = vals.astype(h5py.string_dtype())
            g.create_dataset(col, data=vals)


def read_table(path, key: str = "samples") -> pd.DataFrame:
    with h5py.File(path, "r") as f:
        g = f[key]
        cols = [c if isinstance(c, str) else c.decode() for c in g.attrs["columns"]]
        data = {}
        for col in cols:
            vals = np.asarray(g[col])
            if vals.dtype.kind in ("S", "O"):
                vals = np.array([v.decode() if isinstance(v, bytes) else v for v in vals])
            data[col] = vals
    return pd.DataFrame(data)
