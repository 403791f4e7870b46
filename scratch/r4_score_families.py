"""Score-identity checks for the plpeak and brokenpl families AFTER the
soft-wall redesign (VERDICT r3 #6; plpeak re-checked because the family
density changed).  Pass = every TOTAL |z| <= 4 over 200 fresh catalogs.

Run on the TPU:  PYTHONPATH=/root/repo python scratch/r4_score_families.py
"""
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

for model in ("plpeak_cosmo", "brokenpl_cosmo"):
    cfg = PipelineConfig()
    cfg.score.model = model
    cfg.paths.data_dir = f"data/score_{model}"
    os.makedirs(cfg.paths.data_dir, exist_ok=True)
    t0 = time.perf_counter()
    _stage_score_check(cfg)
    print(f"[{model}] score check wall {(time.perf_counter() - t0) / 60:.1f} min", flush=True)
