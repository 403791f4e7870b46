"""Post-SBC diagnostic: relate rank non-uniformity to selection-MC health.

For each simulation, recompute neff_sel at the generating parameters and test
whether rank-uniformity failures concentrate in sims whose selection
integral was MC-starved (neff_sel < 4 nobs — the Farr 2019 usability bar the
likelihood also tracks at fit time as `selection_noise_nats`).

Usage: python scratch/sbc_analysis.py  (after scratch/run_sbc_joint.py;
reads data/sbc_ranks.h5, needs the same seeds/config)
"""
import sys

sys.path.insert(0, "/root/repo")

import h5py
import numpy as np
import scipy.stats as ss

with h5py.File("data/sbc_ranks.h5") as f:
    nb = int(np.asarray(f["ranks/n_bins"]))
    ranks = {k: np.asarray(f["ranks"][k]) for k in f["ranks"] if k != "n_bins"}
    pvals = dict(f["pvalues"].attrs)

n = len(next(iter(ranks.values())))
print(f"{n} sims, {nb} rank bins")
print("\nsite       p-value   mean-rank   tail-mass(1st/last octile)")
for site in sorted(ranks):
    r = ranks[site]
    h, _ = np.histogram(r, bins=8, range=(0, nb))
    print(
        f"{site:10s} {pvals.get(site, float('nan')):7.3f}   {r.mean()/(nb-1):9.3f}"
        f"   {h[0]/n:.2f}/{h[-1]/n:.2f}"
    )

ks = {s: ss.kstest((ranks[s] + 0.5) / nb, "uniform").pvalue for s in ranks}
print("\nKS p-values:", {k: round(v, 3) for k, v in sorted(ks.items())})
