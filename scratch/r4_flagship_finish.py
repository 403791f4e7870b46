"""Finish the flagship head-to-head: brokenpl pop refit at target_accept
0.9 (divergence cleanup), then compare + dNdm overlay from the final traces."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from bumpcosmology_tpu.ops.interp import set_default_method  # noqa: E402

set_default_method(None)

from bumpcosmology_tpu.pipeline.config import PipelineConfig  # noqa: E402
from bumpcosmology_tpu.pipeline.stages import _stage_compare, run_pop_fit  # noqa: E402
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
DATA_DIR = "/root/repo/data/flagship"

cfg = PipelineConfig()
cfg.paths.data_dir = DATA_DIR
cfg.fit.mass_family = "brokenpl"
cfg.fit.target_accept = 0.9

t0 = time.perf_counter()
res = run_pop_fit(cfg)
summ = res.summary()
scalars = {k: s for k, s in summ.items() if np.ndim(s.get("mean", 0.0)) == 0}
rhat = max(s["rhat"] for s in scalars.values())
ndiv = int(np.asarray(res.sample_stats["diverging"]).sum())
print(f"[refit pop/brokenpl] max rhat {rhat:.4f}, div {ndiv}, "
      f"wall {time.perf_counter() - t0:.0f}s", flush=True)

cfg.fit.target_accept = 0.8  # compare specs don't sample; restore default
t0 = time.perf_counter()
_stage_compare(cfg)
print(f"[compare] wall {time.perf_counter() - t0:.0f}s", flush=True)

from bumpcosmology_tpu.figures.plots import dndm_fitted  # noqa: E402

out = dndm_fitted(f"{DATA_DIR}/trace.h5", out=f"{DATA_DIR}/figures/dNdm_fitted.pdf")
print(f"[figure] {out}", flush=True)
