"""Second independent 128-sim joint SBC (fresh seed) to adjudicate the c-site
p=0.005 in run 1 and pool to a 256-sim certificate."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")
from bumpcosmology_tpu.pipeline.config import PipelineConfig
from bumpcosmology_tpu.pipeline.stages import _stage_sbc

cfg = PipelineConfig()
cfg.sbc.model = "pop_cosmo"
cfg.sbc.n_sims = 128
cfg.sbc.nobs = 16
cfg.sbc.nsamp = 256
cfg.sbc.nsel = 3584
cfg.sbc.campaign_ndraw = 6_500_000
cfg.sbc.num_warmup = 600
cfg.sbc.num_samples = 512
cfg.sbc.thin = 8
cfg.sbc.threshold = 20.0
cfg.sbc.pool_max = 8000
cfg.sbc.pe_bank_size = 16384
cfg.sbc.seed = 777777
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_run2"
import os
os.makedirs("data/sbc_run2", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"SBC suite 2 done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
