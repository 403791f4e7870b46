"""Utilities: trace I/O, checkpointing, profiling."""
from bumpcosmology_tpu.utils.trace import Trace, save_trace, load_trace
from bumpcosmology_tpu.utils.checkpoint import save_warmup, load_warmup
from bumpcosmology_tpu.utils.compile_cache import enable_compilation_cache
