"""Persistent XLA compilation cache wiring.

First compiles of the NUTS/ChEES programs on the remote-TPU path cost
~1-2 minutes; the reference (numpyro scripts, ``run_fit.py``) simply pays
this on every process start.  Here every entry point opts into JAX's
persistent compilation cache so repeat runs (pipeline stages, bench,
fleet members in fresh processes) skip straight to execution.

The cache is keyed on program + compiler version + device topology, so a
single directory is safe to share between the CPU mesh and the TPU chip
*on one machine*.  It is NOT keyed on host CPU features: XLA:CPU AOT
results embed the compile host's instruction set, and loading them on a
different host warns of potential SIGILL (observed when ``~/.cache``
migrated between fleet hosts).  The default directory is therefore
namespaced by a host-CPU fingerprint; explicit ``cache_dir`` /
``BUMPCOSMOLOGY_CACHE_DIR`` values are honored verbatim (single-host use).
"""
from __future__ import annotations

import hashlib
import os
import platform
from pathlib import Path
from typing import Optional

import jax

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = "~/.cache/bumpcosmology_tpu/xla"


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU capabilities (ISA-feature hash)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine() or "unknown"


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 1.0,
) -> Optional[Path]:
    """Turn on JAX's persistent compilation cache; returns the directory.

    ``cache_dir`` resolution order: explicit argument, the
    ``BUMPCOSMOLOGY_CACHE_DIR`` environment variable, then
    ``~/.cache/bumpcosmology_tpu/xla/<host-cpu-fingerprint>`` (see module
    docstring for why the default is per-host).  Entries faster than
    ``min_compile_time_secs`` to compile are not persisted (they cost more
    to deserialize than to recompile).  Returns ``None`` (and leaves the
    config untouched) if this jax build lacks the cache options.
    """
    path = Path(
        cache_dir
        or os.environ.get("BUMPCOSMOLOGY_CACHE_DIR")
        or os.path.join(os.path.expanduser(_DEFAULT_DIR), _host_fingerprint())
    )
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
        )
    except (AttributeError, ValueError, OSError):
        return None
    try:
        # cache regardless of entry size; the directory is user-owned scratch
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (AttributeError, ValueError):
        pass
    return path
