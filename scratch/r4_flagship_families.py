"""Flagship head-to-head: all three mass families fitted on the committed
flagship catalog through the real pipeline stages (VERDICT r3 #4).

Six fits at the reference NUTS config (1000+1000, 4 chains, dense mass):
{bump, plpeak, brokenpl} x {pop (source frame), pop_cosmo (detector frame)},
then `pipeline compare` (PSIS-LOO/WAIC + bridge-sampling evidence ->
model_compare.h5) and the dNdm_fitted overlay figure from the real traces.

Run on the TPU:
  PYTHONPATH=/root/repo python scratch/r4_flagship_families.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bumpcosmology_tpu.ops.interp import set_default_method  # noqa: E402

set_default_method(None)

from bumpcosmology_tpu.pipeline.config import PipelineConfig  # noqa: E402
from bumpcosmology_tpu.pipeline.stages import (  # noqa: E402
    _stage_compare,
    run_pop_cosmo_fit,
    run_pop_fit,
)
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

DATA_DIR = "/root/repo/data/flagship"


def report(tag, res):
    summ = res.summary()
    scalars = {k: s for k, s in summ.items() if np.ndim(s.get("mean", 0.0)) == 0}
    worst_rhat = max(s["rhat"] for s in scalars.values())
    min_site = min(scalars, key=lambda k: scalars[k]["ess"])
    ndiv = int(np.asarray(res.sample_stats["diverging"]).sum())
    print(
        f"[{tag}] max rhat {worst_rhat:.4f}, min ESS "
        f"{scalars[min_site]['ess']:.0f} @ {min_site}, divergences {ndiv}",
        flush=True,
    )
    return worst_rhat, ndiv


def main():
    import os

    from benchmarks.make_flagship_tables import main as make_tables

    if not os.path.exists(f"{DATA_DIR}/pe-samples.h5"):
        make_tables(DATA_DIR)

    cfg = PipelineConfig()
    cfg.paths.data_dir = DATA_DIR
    results = {}
    for family in ("bump", "plpeak", "brokenpl"):
        cfg.fit.mass_family = family
        for kind, runner in (("pop", run_pop_fit), ("pop_cosmo", run_pop_cosmo_fit)):
            tag = f"{kind}/{family}"
            t0 = time.perf_counter()
            try:
                res = runner(cfg)
            except Exception as err:
                print(f"[{tag}] FAILED: {err!r}", flush=True)
                results[tag] = ("FAILED", repr(err))
                continue
            rhat, ndiv = report(tag, res)
            results[tag] = (rhat, ndiv)
            print(f"[{tag}] wall {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    _stage_compare(cfg)
    print(f"[compare] wall {time.perf_counter() - t0:.0f}s", flush=True)

    from bumpcosmology_tpu.figures.plots import dndm_fitted

    out = dndm_fitted(f"{DATA_DIR}/trace.h5", out=f"{DATA_DIR}/figures/dNdm_fitted.pdf")
    print(f"[figure] {out}", flush=True)
    print("[done]", results, flush=True)


if __name__ == "__main__":
    main()
