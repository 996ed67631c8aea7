"""Native (C) helpers with pure-Python fallbacks.

The shared library is compiled lazily on first import and cached next to
the source. If no C compiler is available the Python fallback is used —
it produces identical results, only slower.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

log = logging.getLogger("sage_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_native.so")
_SRC_PATHS = sorted(
    os.path.join(_HERE, f) for f in os.listdir(_HERE) if f.endswith(".c")
)

_lib = None


def _build() -> bool:
    # The mzML scanner needs zlib; if linking -lz fails (no zlib dev
    # files), fall back to building the other helpers without it so the
    # deisotope/f32-sum fast paths keep working.
    variants = [
        (_SRC_PATHS, ["-lm", "-lz"]),
        ([p for p in _SRC_PATHS if not p.endswith("mzml_scan.c")], ["-lm"]),
    ]
    for srcs, libs in variants:
        for cc in ("cc", "gcc", "clang"):
            try:
                # Build into a temp file then atomically rename, so
                # concurrent test workers can't observe a partial .so.
                fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
                os.close(fd)
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", *srcs, "-o", tmp, *libs],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _SO_PATH)
                return True
            except (OSError, subprocess.CalledProcessError):
                if os.path.exists(tmp):
                    os.unlink(tmp)
                continue
    return False


def ensure_built() -> bool:
    """Force the lazy build/load now (CI smoke entry point). Returns
    True when the native helpers are available, False when the pure-
    Python fallbacks will be used."""
    return bool(_load())


def _stale() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    return any(os.path.getmtime(src) > so_mtime for src in _SRC_PATHS)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        if not _build():
            log.warning("no C compiler found; using slow Python fallback for f32 sums")
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _lib = False
        return _lib
    lib.seq_f32_sum_rows.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.seq_f32_sum.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.seq_f32_sum.restype = ctypes.c_float
    lib.seq_f32_cumsum_rows.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.deisotope.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    if hasattr(lib, "mzml_scan"):  # absent when zlib was unavailable
        lib.mzml_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.mzml_scan.restype = ctypes.c_long
        lib.mzml_rec_size.restype = ctypes.c_int64
        lib.mzml_decode_binary.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.mzml_decode_binary.restype = ctypes.c_long
    _lib = lib
    return _lib


# numpy mirror of rec_t in mzml_scan.c (all fields 8 bytes -> no padding)
_MAXP = 4
_MAXA = 4
MZML_REC_DTYPE = np.dtype(
    [
        ("id_off", "<i8"), ("id_len", "<i8"),
        ("ms_level", "<i8"), ("centroid", "<i8"),
        ("sst_unit", "<i8"), ("skip", "<i8"),
        ("n_prec", "<i8"), ("n_arr", "<i8"),
        ("tic", "<f8"), ("sst", "<f8"), ("iit", "<f8"),
        ("p_mz", "<f8", (_MAXP,)), ("p_int", "<f8", (_MAXP,)),
        ("p_im", "<f8", (_MAXP,)),
        ("p_iso_target", "<f8", (_MAXP,)), ("p_iso_lo", "<f8", (_MAXP,)),
        ("p_iso_hi", "<f8", (_MAXP,)),
        ("p_charge", "<i8", (_MAXP,)),
        ("p_has_int", "<i8", (_MAXP,)), ("p_has_im", "<i8", (_MAXP,)),
        ("p_has_lo", "<i8", (_MAXP,)), ("p_has_hi", "<i8", (_MAXP,)),
        ("p_ref_off", "<i8", (_MAXP,)), ("p_ref_len", "<i8", (_MAXP,)),
        ("a_kind", "<i8", (_MAXA,)), ("a_f64", "<i8", (_MAXA,)),
        ("a_zlib", "<i8", (_MAXA,)),
        ("a_off", "<i8", (_MAXA,)), ("a_len", "<i8", (_MAXA,)),
    ]
)


def mzml_scan(data: bytes):
    """Scan an mzML document with the C fast path. Returns a structured
    record array (MZML_REC_DTYPE) or None when the C library is
    unavailable or the scanner bailed (caller falls back to the Python
    parser)."""
    lib = _load()
    if not lib or not hasattr(lib, "mzml_scan"):
        return None
    if int(lib.mzml_rec_size()) != MZML_REC_DTYPE.itemsize:
        log.warning(
            "mzml_scan record size mismatch (%d != %d); using Python parser",
            int(lib.mzml_rec_size()), MZML_REC_DTYPE.itemsize,
        )
        return None
    max_rec = data.count(b"<spectrum ") + data.count(b"<spectrum>") + 1
    recs = np.zeros(max_rec, dtype=MZML_REC_DTYPE)
    n = lib.mzml_scan(
        data, len(data), recs.ctypes.data_as(ctypes.c_void_p), max_rec
    )
    if n < 0:
        return None
    return recs[:n]


def _f32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def seq_f32_sum_rows(vals: np.ndarray, lens: np.ndarray, init: float = 0.0) -> np.ndarray:
    """Per-row strictly-sequential f32 sums: out[i] = init + sum(vals[i, :lens[i]])."""
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    n, stride = vals.shape
    out = np.empty(n, dtype=np.float32)
    lib = _load()
    if lib:
        lib.seq_f32_sum_rows(_f32ptr(vals), _i32ptr(lens), n, stride, np.float32(init), _f32ptr(out))
        return out
    for i in range(n):
        acc = np.float32(init)
        for j in range(int(lens[i])):
            acc = np.float32(acc + vals[i, j])
        out[i] = acc
    return out


def seq_f32_sum(vals: np.ndarray) -> np.float32:
    """Strictly-sequential f32 sum of a vector."""
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    lib = _load()
    if lib:
        return np.float32(lib.seq_f32_sum(_f32ptr(vals), vals.size))
    acc = np.float32(0.0)
    for v in vals:
        acc = np.float32(acc + v)
    return acc


def deisotope(mz: np.ndarray, inten: np.ndarray, max_charge: int, ppm: float, min_mz: float):
    """Two-pointer C13 deisotoping (spectrum.rs:179-227 in the reference).

    Returns (intensity, charge, envelope): rolled-up envelope intensities,
    assigned charge (0 = none), and parent index (-1 = none).
    """
    mz = np.ascontiguousarray(mz, dtype=np.float32)
    inten = np.ascontiguousarray(inten, dtype=np.float32)
    n = mz.shape[0]
    out_int = np.empty(n, dtype=np.float32)
    out_charge = np.empty(n, dtype=np.int8)
    out_env = np.empty(n, dtype=np.int32)
    lib = _load()
    if lib:
        lib.deisotope(
            _f32ptr(mz),
            _f32ptr(inten),
            n,
            int(max_charge),
            np.float32(ppm),
            np.float32(min_mz),
            _f32ptr(out_int),
            out_charge.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            _i32ptr(out_env),
        )
        return out_int, out_charge, out_env

    NEUTRON = np.float32(1.00335)
    ppm = np.float32(ppm)
    min_mz = np.float32(min_mz)
    out_int[:] = inten
    out_charge[:] = 0
    out_env[:] = -1
    for i in range(n - 1, -1, -1):
        j = max(i - 1, 0)
        while (
            np.float32(mz[i] - mz[j]) <= np.float32(NEUTRON + np.float32(ppm * mz[i]) / np.float32(1e6))
            and mz[j] >= min_mz
        ):
            delta = np.float32(mz[i] - mz[j])
            tol = np.float32(np.float32(ppm * mz[i]) / np.float32(1e6))
            for charge in range(1, max_charge + 1):
                iso = np.float32(NEUTRON / np.float32(charge))
                if abs(np.float32(delta - iso)) <= tol and inten[i] < inten[j]:
                    if out_charge[i] != 0 and out_charge[i] != charge:
                        continue
                    out_int[j] = np.float32(out_int[j] + out_int[i])
                    out_charge[j] = charge
                    out_charge[i] = charge
                    out_env[i] = j
            if j == 0:
                break
            j -= 1
            if j == 0:
                break
    return out_int, out_charge, out_env


def seq_f32_cumsum_rows(vals: np.ndarray, init: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row inclusive sequential-f32 prefix sums; tail padded with the final value."""
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    init = np.ascontiguousarray(init, dtype=np.float32)
    lens = np.ascontiguousarray(lens, dtype=np.int32)
    n, stride = vals.shape
    out = np.empty_like(vals)
    lib = _load()
    if lib:
        lib.seq_f32_cumsum_rows(_f32ptr(vals), _f32ptr(init), _i32ptr(lens), n, stride, _f32ptr(out))
        return out
    for i in range(n):
        acc = np.float32(init[i])
        for j in range(stride):
            if j < int(lens[i]):
                acc = np.float32(acc + vals[i, j])
            out[i, j] = acc
    return out
