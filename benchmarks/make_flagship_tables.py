"""Expand the committed flagship catalog into pipeline-layout tables.

The committed ``benchmarks/flagship_catalog.npz`` stores the detector-frame
arrays (m1_det, q, dL, pdraw_det) that ``bench.py`` consumes directly.  The
pipeline stages (``run_pop_fit`` / ``run_pop_cosmo_fit`` / ``compare`` /
``figures``) read source-frame ``pe-samples.h5`` / ``selection-samples.h5``
tables (the reference's artifact layout, ``run_fit.py:19-20``) and derive the
detector frame themselves.  The detector-frame conversion is a deterministic
Planck18 bijection (``run_cosmo_fit.py:22-30`` semantics), so this script
inverts it exactly: z = z_of_dL(dL), m1 = m1_det/(1+z),
wt = pdraw_det / |∂(m1d,q,dL)/∂(m1,q,z)| — making the committed catalog the
single source of truth for every head-to-head family fit.

Usage:  PYTHONPATH=/root/repo python benchmarks/make_flagship_tables.py [outdir]
(default outdir: data/flagship)
"""
import sys
from pathlib import Path

import numpy as np
import pandas as pd

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

from bumpcosmology_tpu.data.weights import dm1sqz_dm1ddqdl, planck18_z_of_dl_np  # noqa: E402
from bumpcosmology_tpu.utils.io import write_table  # noqa: E402


def main(outdir: str = "data/flagship") -> None:
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    with np.load(HERE / "flagship_catalog.npz") as d:
        m1d, q, dl, lp = d["ev_a"], d["ev_q"], d["ev_c"], d["ev_lp"]
        sm1d, sq, sdl, slp, sln = (
            d["sel_a"], d["sel_q"], d["sel_c"], d["sel_lp"], d["sel_ln"]
        )

    def to_source(m1d, q, dl, log_pdraw_det):
        z = planck18_z_of_dl_np(np.asarray(dl, dtype=np.float64))
        m1 = np.asarray(m1d, dtype=np.float64) / (1.0 + z)
        jac = dm1sqz_dm1ddqdl(m1, np.asarray(q, dtype=np.float64), z)
        wt = np.exp(np.asarray(log_pdraw_det, dtype=np.float64)) / jac
        return m1, z, wt

    nobs, nsamp = m1d.shape
    m1, z, wt = to_source(m1d.ravel(), q.ravel(), dl.ravel(), lp.ravel())
    pe = pd.DataFrame(
        {
            "evt": np.repeat([f"FLAGSHIP_{i:03d}" for i in range(nobs)], nsamp),
            "m1": m1,
            "q": np.asarray(q, dtype=np.float64).ravel(),
            "z": z,
            "wt": wt,
        }
    )
    sm1, sz, swt = to_source(sm1d, sq, sdl, slp)
    sel = pd.DataFrame(
        {
            "m1": sm1,
            "q": np.asarray(sq, dtype=np.float64),
            "z": sz,
            "pdraw": swt,
            "ndraw": float(np.exp(sln)),
        }
    )
    write_table(out / "pe-samples.h5", pe)
    write_table(out / "selection-samples.h5", sel)
    print(
        f"[flagship-tables] wrote {nobs}x{nsamp} PE rows + {len(sel)} selection "
        f"rows (ndraw {float(np.exp(sln)):.4g}) to {out}/"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
