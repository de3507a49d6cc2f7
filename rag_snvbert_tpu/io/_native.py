"""ctypes bindings for the native (C++) host-side components.

The shared library is built on demand with g++ (cached next to the
source); every consumer must degrade gracefully to the pure-Python path if
the toolchain or zlib is unavailable (``get_vcf_reader() -> None``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("rag_snvbert_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "vcf_reader.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libvcf_reader.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-lz", "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("native build failed to run: %s", e)
        return False
    if res.returncode != 0:
        log.warning("native build failed:\n%s", res.stderr)
        return False
    return True


def get_vcf_reader():
    """Load (building if needed) the native VCF reader, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native load failed: %s", e)
            return None
        lib.vcf_scan.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64),
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.vcf_scan.restype = ctypes.c_int
        lib.vcf_parse_gt.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64]
        lib.vcf_parse_gt.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_read_gt(path: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Fast path: (gt [V,S,2] int8 binarized, pos [V] int64) or None."""
    lib = get_vcf_reader()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    ns = ctypes.c_int64()
    if lib.vcf_scan(path.encode(), ctypes.byref(nv), ctypes.byref(ns)) != 0:
        return None
    n_variants, n_samples = nv.value, ns.value
    if n_variants < 0 or n_samples <= 0:
        return None
    gt = np.empty(n_variants * n_samples * 2, np.int8)
    pos = np.empty(n_variants, np.int64)
    got = lib.vcf_parse_gt(path.encode(), gt, pos, n_variants, n_samples)
    if got != n_variants:
        log.warning("native parse returned %d of %d variants; falling back",
                    got, n_variants)
        return None
    return gt.reshape(n_variants, n_samples, 2), pos


def native_write_vcf_body(path: str, prefixes: bytes,
                          prefix_off: np.ndarray,
                          p1: np.ndarray, p2: np.ndarray) -> bool:
    """Append the per-sample GT:HDS:GP:DS body to an already-written
    header via the C++ writer.  Returns False (caller falls back to the
    Python formatter) if the native library is unavailable or fails."""
    lib = get_vcf_reader()
    if lib is None:
        return False
    if not hasattr(lib, "_write_bound"):
        lib.vcf_write_body.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong, ctypes.c_longlong]
        lib.vcf_write_body.restype = ctypes.c_longlong
        lib._write_bound = True
    n_v, n_s = p1.shape
    got = lib.vcf_write_body(
        path.encode(), 1 if str(path).endswith(".gz") else 0,
        prefixes, np.ascontiguousarray(prefix_off, np.int64),
        np.ascontiguousarray(p1, np.float32),
        np.ascontiguousarray(p2, np.float32), n_v, n_s)
    if got != n_v:
        log.warning("native VCF write returned %d of %d variants", got, n_v)
        return False
    return True
