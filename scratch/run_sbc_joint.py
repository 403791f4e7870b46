"""Joint-model SBC at scale: 128 simulations through the pipeline sbc stage.

Writes <repo>/data/sbc_ranks.h5 (+ the sbc_ranks figure) and prints per-site
uniformity p-values.  Run on the TPU; ~20-40 min.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from bumpcosmology_tpu.ops.interp import set_default_method

set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")

from bumpcosmology_tpu.pipeline.config import PipelineConfig
from bumpcosmology_tpu.pipeline.stages import _stage_sbc

import numpy as np

cfg = PipelineConfig()
cfg.sbc.model = "pop_cosmo"
cfg.sbc.n_sims = 128
cfg.sbc.nobs = 16
cfg.sbc.nsamp = 256  # 4x less per-event estimator bias (score test, DESIGN.md §9)
cfg.sbc.nsel = 3584  # fresh-noise: selection subset == event pool per sim (pool ~4050 at 6.5M draws)
cfg.sbc.campaign_ndraw = 6_500_000
cfg.sbc.num_warmup = 600
cfg.sbc.num_samples = 512
cfg.sbc.thin = 8
cfg.sbc.threshold = 20.0
cfg.sbc.pool_max = 8000
cfg.sbc.pe_bank_size = 16384
cfg.fit.n_grid = 128
cfg.fit.n_z = 256

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"SBC suite done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)

from bumpcosmology_tpu.figures.plots import sbc_ranks_hist

out = sbc_ranks_hist(cfg.paths.path("sbc_ranks.h5"), out="figures/sbc_ranks.pdf")
print("figure:", out)
