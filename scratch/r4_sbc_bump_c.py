"""One more independent 128-sim bump-family joint SBC suite, fresh seed
(VERDICT r3 #7): settle whether the persistent low-p `c` site is a 14-site
look-elsewhere effect or a real residual.  Same parameters as the two
certified round-3 suites (scratch/run_sbc_joint2.py)."""
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
cfg.sbc.pe_bank_size = 16384
cfg.sbc.seed = 766001
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_bump_r4"
os.makedirs("data/sbc_bump_r4", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"bump SBC suite (run 3) done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
