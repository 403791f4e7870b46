"""ctypes binding to the native (C++) runtime library.

Loads ``native/build/libbumpnative.so``, building it with ``make`` on first
use if the toolchain is available.  All callers treat the native path as an
*accelerated optional*: :func:`available` gates it, and the pure
numpy/JAX implementations remain the reference semantics (the native SNR
kernel is cross-checked against the JAX one in ``tests/test_native.py``).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["available", "network_snr_native", "alias_sample"]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libbumpnative.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bumpnative_abi_version.restype = ctypes.c_int
        if lib.bumpnative_abi_version() != 1:
            raise OSError("bumpnative ABI mismatch")

        lib.bumpnative_network_snr.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        ] * 8 + [
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.bumpnative_alias_sample.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def network_snr_native(
    m1_det, m2_det, dl_gpc, iota, ra, dec, psi, gmst,
    f_min: float = 10.0, f_max: float = 2048.0, n_f: int = 512,
):
    """Native CPU network SNR (H1, L1, V1, net) — OpenMP over the batch."""
    lib = _load()
    if lib is None:
        raise RuntimeError("bumpnative library unavailable (build failed?)")
    args = [np.ascontiguousarray(np.asarray(a, dtype=np.float64)) for a in
            (m1_det, m2_det, dl_gpc, iota, ra, dec, psi, gmst)]
    n = len(args[0])
    out = np.empty((n, 4), dtype=np.float64)
    lib.bumpnative_network_snr(*args, n, f_min, f_max, n_f, out)
    return {"H1": out[:, 0], "L1": out[:, 1], "V1": out[:, 2], "net": out[:, 3]}


def alias_sample(weights, k: int, seed: int) -> np.ndarray:
    """Draw ``k`` indices ∝ ``weights`` via the alias method (O(1)/draw)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("bumpnative library unavailable (build failed?)")
    w = np.ascontiguousarray(np.asarray(weights, dtype=np.float64))
    out = np.empty(k, dtype=np.int64)
    lib.bumpnative_alias_sample(w, len(w), k, seed, out)
    return out
