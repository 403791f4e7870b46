"""brokenpl score-identity check (the half the queue's timeout cut)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bumpcosmology_tpu.ops.interp import set_default_method  # noqa: E402

set_default_method(None)

from bumpcosmology_tpu.pipeline.config import PipelineConfig  # noqa: E402
from bumpcosmology_tpu.pipeline.stages import _stage_score_check  # noqa: E402
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
cfg = PipelineConfig()
cfg.score.model = "brokenpl_cosmo"
cfg.paths.data_dir = "data/score_brokenpl_cosmo"
os.makedirs(cfg.paths.data_dir, exist_ok=True)
t0 = time.perf_counter()
_stage_score_check(cfg)
print(f"[brokenpl_cosmo] score check wall {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
