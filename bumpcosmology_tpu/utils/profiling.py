"""Profiling and phase-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5 — tqdm bars
only).  Here:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory (op-level TPU timeline);
* :class:`PhaseTimer` — wall-clock phase accounting (warmup vs sampling vs
  post-processing) with a readable report;
* :func:`xla_cost` — XLA's static cost analysis (flops / bytes accessed /
  transcendentals) for any jitted callable, the first stop for "where does
  the time go" questions before opening a full trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

__all__ = ["trace", "PhaseTimer", "xla_cost"]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/jax-trace'): ...`` — capture a device profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulate named wall-clock phases; print a one-line-per-phase report."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k:24s} {v:9.2f}s ({100 * v / total:5.1f}%)" for k, v in self.phases.items()]
        lines.append(f"{'total':24s} {total:9.2f}s")
        return "\n".join(lines)


def xla_cost(fn, *example_args) -> Dict[str, float]:
    """Static XLA cost analysis of ``jit(fn)`` at the example arguments."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    keys = ("flops", "transcendentals", "bytes accessed")
    return {k: float(analysis.get(k, 0.0)) for k in keys}
