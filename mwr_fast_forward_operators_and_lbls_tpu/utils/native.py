"""ctypes bindings to the native ncio core (native/ncio/libncio.so).

Auto-builds with `make` on first use if a toolchain is present; every entry
point has a NumPy fallback, so the framework works (slower) without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NCIO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "ncio")
_LIB_PATH = os.path.join(_NCIO_DIR, "libncio.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NCIO_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NCIO_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ncio_byteswap.restype = ctypes.c_int
    lib.ncio_byteswap.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_size_t, ctypes.c_int]
    lib.ncio_gather_records.restype = ctypes.c_int
    lib.ncio_gather_records.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_int]
    lib.ncio_parse_table.restype = ctypes.c_longlong
    lib.ncio_parse_table.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_be(buf: memoryview | bytes, dtype, count: int,
              offset: int = 0) -> np.ndarray:
    """Big-endian slice of `buf` -> native-endian array (native fast path)."""
    dt_be = np.dtype(dtype).newbyteorder(">")
    dt_native = dt_be.newbyteorder("=")
    lib = _load()
    if lib is None or dt_be.itemsize == 1:
        return np.frombuffer(buf, dt_be, count, offset).astype(dt_native)
    out = np.empty(count, dt_native)
    src = np.frombuffer(buf, np.uint8, count * dt_be.itemsize, offset)
    rc = lib.ncio_byteswap(
        out.ctypes.data_as(ctypes.c_void_p),
        src.ctypes.data_as(ctypes.c_void_p), count, dt_be.itemsize)
    if rc != 0:
        return np.frombuffer(buf, dt_be, count, offset).astype(dt_native)
    return out


def gather_records_be(buf, dtype, numrecs: int, recsize: int, per_rec: int,
                      begin: int) -> np.ndarray:
    """Strided record-variable gather + byteswap in one native pass."""
    dt_be = np.dtype(dtype).newbyteorder(">")
    dt_native = dt_be.newbyteorder("=")
    lib = _load()
    if lib is None:
        parts = [np.frombuffer(buf, dt_be, per_rec, begin + r * recsize)
                 for r in range(numrecs)]
        return (np.stack(parts).astype(dt_native) if parts
                else np.empty((0, per_rec), dt_native))
    out = np.empty((numrecs, per_rec), dt_native)
    nbytes_needed = begin + (numrecs - 1) * recsize + per_rec * dt_be.itemsize \
        if numrecs else 0
    src = np.frombuffer(buf, np.uint8, max(nbytes_needed - begin, 0), begin)
    rc = lib.ncio_gather_records(
        out.ctypes.data_as(ctypes.c_void_p),
        src.ctypes.data_as(ctypes.c_void_p), numrecs, recsize, per_rec,
        dt_be.itemsize)
    if rc != 0:
        parts = [np.frombuffer(buf, dt_be, per_rec, begin + r * recsize)
                 for r in range(numrecs)]
        return np.stack(parts).astype(dt_native)
    return out


def parse_table(path: str, ncols: int, skip_header: int,
                skip_footer: int, max_rows: int = 1_000_000):
    """Native whitespace-table parse -> (rows, ncols) float64, or None if the
    native library is unavailable (caller falls back to Python parsing)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_rows, ncols), np.float64)
    n = lib.ncio_parse_table(
        path.encode(), ncols, skip_header, skip_footer,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows)
    if n < 0:
        return None
    return out[:n].copy()
