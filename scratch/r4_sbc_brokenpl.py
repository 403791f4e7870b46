"""64-sim fresh-noise SBC smoke for the joint BROKEN POWER LAW model
(VERDICT r3 #6): the family shares the taper/q-table/soft-wall code paths
with plpeak, so the plpeak fix should transfer — verify it does."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

from bumpcosmology_tpu.ops.interp import set_default_method  # noqa: E402

set_default_method(None)
from bumpcosmology_tpu.pipeline.config import PipelineConfig  # noqa: E402
from bumpcosmology_tpu.pipeline.stages import _stage_sbc  # noqa: E402
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
cfg = PipelineConfig()
cfg.sbc.model = "brokenpl_cosmo"
cfg.sbc.n_sims = 64
cfg.sbc.nobs = 16
cfg.sbc.nsamp = 256
cfg.sbc.nsel = 3584
cfg.sbc.campaign_ndraw = 6_500_000
cfg.sbc.num_warmup = 600
cfg.sbc.num_samples = 512
cfg.sbc.thin = 8
cfg.sbc.threshold = 20.0
cfg.sbc.pe_bank_size = 16384
cfg.sbc.seed = 755001
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_brokenpl_r4"
os.makedirs("data/sbc_brokenpl_r4", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"brokenpl SBC smoke done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
