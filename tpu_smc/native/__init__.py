"""Builder/loader for the native C++ runtime library (smc_native.cpp).

Compiled on first use with g++ into a cached shared object; every entry
point has a pure-Python fallback elsewhere in the package (rng.GlibcRandom,
io.LocalWriter's Python formatter, tests/reference_impls.py), so the
framework works without a toolchain — the native path is the fast one.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent / "smc_native.cpp"
_CACHE = Path(
    os.environ.get("SMC_NATIVE_CACHE", Path(tempfile.gettempdir()) / "smc_native")
)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    _CACHE.mkdir(parents=True, exist_ok=True)
    so = _CACHE / f"smc_native_{int(_SRC.stat().st_mtime)}.so"
    if so.exists():
        return so
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(so)],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first call; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))

    lib.glibc_srand.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.glibc_rand.argtypes = [ctypes.c_void_p]
    lib.glibc_rand.restype = ctypes.c_uint32
    lib.glibc_rand_fill.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
    lib.glibc_box_muller.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double)]
    lib.format_local_rows.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64]
    lib.format_local_rows.restype = ctypes.c_int64
    lib.format_positions_row.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_int64]
    lib.format_positions_row.restype = ctypes.c_int64
    lib.format_last_state.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_char_p,
        ctypes.c_int64]
    lib.format_last_state.restype = ctypes.c_int64
    lib.cluster_analysis_ref.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ----------------------------------------------------------------------
# Typed wrappers
# ----------------------------------------------------------------------

class NativeGlibcRandom:
    """Native twin of rng.GlibcRandom (cross-checked in tests)."""

    def __init__(self, seed: int = 1):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._state = ctypes.create_string_buffer(128)
        lib.glibc_srand(self._state, seed & 0xFFFFFFFF)

    def rand(self) -> int:
        return int(self._lib.glibc_rand(self._state))

    def rand_array(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint32)
        self._lib.glibc_rand_fill(
            self._state, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n)
        return out

    def box_muller(self, sigma: float, length: int) -> np.ndarray:
        out = np.empty(length, dtype=np.float64)
        self._lib.glibc_box_muller(
            self._state, sigma, length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out


def format_local_rows(density: np.ndarray, mobility: np.ndarray,
                      ncx: int, ncz: int) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    d = np.ascontiguousarray(density.reshape(-1), dtype=np.uint64)
    m = np.ascontiguousarray(mobility.reshape(-1), dtype=np.uint64)
    cap = 64 * d.size + 1024
    buf = ctypes.create_string_buffer(cap)
    n = lib.format_local_rows(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ncx, ncz, buf, cap)
    return buf.raw[:n] if n >= 0 else None


def format_positions_row(r: np.ndarray) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(r.reshape(-1), dtype=np.float64)
    cap = 32 * flat.size + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.format_positions_row(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flat.size, buf, cap)
    return buf.raw[:n] if n >= 0 else None


def format_last_state(r: np.ndarray) -> Optional[bytes]:
    lib = load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(r.reshape(-1), dtype=np.float64)
    cap = 40 * flat.size + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.format_last_state(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        flat.size, buf, cap)
    return buf.raw[:n] if n >= 0 else None


def cluster_analysis_ref(r: np.ndarray, n: int, box_l: float,
                         cutoff: float) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(r.reshape(-1), dtype=np.float64)
    out = np.zeros(((n * n - n) // 2, 3), dtype=np.int32)
    lib.cluster_analysis_ref(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, box_l,
        cutoff, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
