"""128-sim fresh-noise SBC for the joint POWER-LAW+PEAK model (plpeak_cosmo).

Same suite parameters as the certified bump-family run 2
(scratch/run_sbc_joint2.py); the mmin prior is restricted to the campaign's
m1 >= 5 support slice (see make_plpeak_cosmo_sbc_spec_builder)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from bumpcosmology_tpu.ops.interp import set_default_method
set_default_method("matmul" if jax.devices()[0].platform in ("tpu", "axon") else "gather")
from bumpcosmology_tpu.pipeline.config import PipelineConfig
from bumpcosmology_tpu.pipeline.stages import _stage_sbc
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
cfg = PipelineConfig()
cfg.sbc.model = "plpeak_cosmo"
cfg.sbc.n_sims = 128
cfg.sbc.nobs = 16
cfg.sbc.nsamp = 256
cfg.sbc.nsel = 3584
cfg.sbc.campaign_ndraw = 6_500_000
cfg.sbc.num_warmup = 600
cfg.sbc.num_samples = 512
cfg.sbc.thin = 8
cfg.sbc.threshold = 20.0
cfg.sbc.pe_bank_size = 16384
cfg.sbc.seed = 555001
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_plpeak"
import os
os.makedirs("data/sbc_plpeak", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"plpeak SBC suite done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
