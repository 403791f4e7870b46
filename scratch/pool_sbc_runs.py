"""Pool the two independent 128-sim SBC runs into a 256-sim certificate.

Writes benchmarks/sbc/sbc_ranks_256_pooled.h5 (+ figure) and prints per-site
p-values for run1, run2, and the pool.
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import h5py

from bumpcosmology_tpu.inference.calibration import sbc_uniformity_pvalues
from bumpcosmology_tpu.pipeline.stages import write_sbc_artifact

def load(path):
    with h5py.File(path) as f:
        nb = int(np.asarray(f["ranks/n_bins"]))
        ranks = {k: np.asarray(f[f"ranks/{k}"]) for k in f["ranks"] if k != "n_bins"}
    return nb, ranks

nb1, r1 = load("benchmarks/sbc/sbc_ranks_128_snrchannel_run1.h5")
nb2, r2 = load("data/sbc_run2/sbc_ranks.h5")
assert nb1 == nb2, (nb1, nb2)
pooled = {k: np.concatenate([r1[k], r2[k]]) for k in r1}
pooled["__n_bins__"] = np.asarray(nb1)
for name, rr in (("run1", {**r1, "__n_bins__": np.asarray(nb1)}),
                 ("run2", {**r2, "__n_bins__": np.asarray(nb2)}),
                 ("pooled", pooled)):
    p = sbc_uniformity_pvalues(rr)
    print(f"== {name}: ", {k: round(v, 4) for k, v in sorted(p.items())})

p = sbc_uniformity_pvalues(pooled)
bad = write_sbc_artifact(
    "benchmarks/sbc/sbc_ranks_256_pooled.h5", "pop_cosmo", 256, pooled, p
)
print("pooled failing sites:", bad)

from bumpcosmology_tpu.figures.plots import sbc_ranks_hist
out = sbc_ranks_hist("benchmarks/sbc/sbc_ranks_256_pooled.h5",
                     out="benchmarks/sbc/sbc_ranks_256_pooled.pdf")
print("figure:", out)
