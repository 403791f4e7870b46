"""Refit bump + brokenpl flagship models under the round-5 surface, then
rebuild the comparison artifacts.

The round-5 hot-loop redesign removed the MXU bf16 interp rounding (±0.1
nats of jagged noise on every log-density fetch) — the prime suspect for
the phenomenological families' residual ~0.4% divergence rate (VERDICT r4
#6) — and moved brokenpl's q-table-edge wall to M_TAB_HI.  plpeak is refit
separately with the multimodality machinery (scratch/r5_plpeak_modes.py);
this script refreshes the other four traces at the reference NUTS config,
reruns `pipeline compare` (LOO/WAIC + bridge evidence) and the dNdm
overlay, and prints the div column for the head-to-head table.

Run on the TPU after r5_plpeak_modes.py:
  PYTHONPATH=/root/repo python scratch/r5_flagship_finish.py
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


cfg = PipelineConfig()
cfg.paths.data_dir = DATA_DIR
results = {}
for family in ("bump", "brokenpl"):
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

from bumpcosmology_tpu.figures.plots import dndm_fitted  # noqa: E402

out = dndm_fitted(f"{DATA_DIR}/trace.h5", out=f"{DATA_DIR}/figures/dNdm_fitted.pdf")
print(f"[figure] {out}", flush=True)
print("[done]", results, flush=True)
