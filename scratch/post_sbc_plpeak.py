"""Post-process the plpeak_cosmo SBC run: copy artifact + render figure."""
import shutil, sys
sys.path.insert(0, "/root/repo")
import h5py
import matplotlib
matplotlib.use("Agg")

src = "data/sbc_plpeak/sbc_ranks.h5"
dst = "benchmarks/sbc/sbc_ranks_128_plpeak_cosmo.h5"
shutil.copyfile(src, dst)
with h5py.File(dst) as f:
    print("model:", f.attrs["model"], "n_sims:", int(f.attrs["n_sims"]),
          "all_pass:", bool(f.attrs["all_pass"]))
    sites = [s.decode() for s in f["pvalues/site"][:]]
    ps = f["pvalues/p"][:]
    for s, p in sorted(zip(sites, ps), key=lambda t: t[1]):
        print(f"  {s:10s} p={p:.4f} {'FAIL' if p < 0.01 else ''}")

from bumpcosmology_tpu.figures.plots import sbc_ranks_hist
out = sbc_ranks_hist(dst, out="benchmarks/sbc/sbc_ranks_128_plpeak_cosmo.pdf")
print("figure:", out)
