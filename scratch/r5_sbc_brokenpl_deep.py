"""128-sim fresh-noise SBC certificate for the joint BROKEN POWER LAW model
(VERDICT r4 #2), with the round-5 upgrades active:

* table-edge soft wall moved to M_TAB_HI (the mmax in (190, 200] prior slice
  is no longer likelihood-degenerate — r4 advisor finding);
* bank-quality floor ENFORCED (adaptive moment-matched proposals replace
  warn-and-proceed; zero sub-bar banks expected in this log);
* rate-reconstruction rank check recorded in the artifact (VERDICT r4 #5).

Matches the certified plpeak/bump suites' config (128 sims, 16 events,
256 samples, 3584 selection atoms).
"""
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
cfg.sbc.n_sims = 128
cfg.sbc.nobs = 16
cfg.sbc.nsamp = 256
cfg.sbc.nsel = 3584
cfg.sbc.campaign_ndraw = 6_500_000
cfg.sbc.num_warmup = 800
cfg.sbc.num_samples = 512
cfg.sbc.thin = 8
cfg.sbc.threshold = 20.0
cfg.sbc.pe_bank_size = 16384
cfg.sbc.seed = 951007
cfg.sbc.max_depth = 10
cfg.fit.n_grid = 128
cfg.fit.n_z = 256
cfg.paths.data_dir = "data/sbc_brokenpl_r5_deep"
os.makedirs("data/sbc_brokenpl_r5_deep", exist_ok=True)

t0 = time.perf_counter()
_stage_sbc(cfg)
print(f"brokenpl 128-sim SBC done in {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
