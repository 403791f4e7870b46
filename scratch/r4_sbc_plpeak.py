"""128-sim fresh-noise SBC for the joint POWER-LAW+PEAK model, round 4 —
after the soft-wall redesign of the family density (VERDICT r3 #3).

Same suite parameters as the certified bump run 2 and the failed round-3
plpeak attempt (scratch/run_sbc_plpeak.py), fresh seed."""
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
cfg.sbc.seed = 744001
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_plpeak_r4"
os.makedirs("data/sbc_plpeak_r4", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"plpeak SBC suite done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
