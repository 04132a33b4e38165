"""Native host-side finalization kernels (hostops.c).

`ksw_global_batch(...)` — banded global alignment + CIGAR for a batch of
small per-record jobs (ksw_global2 semantics; the batched device op
ops/global_sw.global_align_batch is the reference implementation and
remains the fallback).  `nm_md_batch(...)` — NM/MD:Z generation
(finalize._nm_md semantics).

Compiled on first use with the system compiler and cached next to the
source; callers must fall back to the pure-Python/device paths when
`available()` is False.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "hostops.c")
_LIB = os.path.join(_DIR, "_hostops.so")
_lock = threading.Lock()
_lib = None
_failed = False

_i8p = ctypes.POINTER(ctypes.c_int8)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.ksw_global_batch.restype = ctypes.c_int
            lib.ksw_global_batch.argtypes = [
                ctypes.c_int64, _u8p, _i64p, _u8p, _i64p, _i32p, _i8p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, _i32p, _i32p, _u32p, ctypes.c_int64]
            lib.nm_md_batch.restype = ctypes.c_int64
            lib.nm_md_batch.argtypes = [
                ctypes.c_int64, _u32p, _i64p, _u8p, _i64p, _u8p, _i64p,
                _u8p, _i32p, ctypes.c_char_p, ctypes.c_int64, _i64p]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _cat(arrs, dtype):
    offs = np.zeros(len(arrs) + 1, np.int64)
    np.cumsum([len(a) for a in arrs], out=offs[1:])
    flat = np.empty(int(offs[-1]), dtype)
    for a, o in zip(arrs, offs):
        flat[int(o):int(o) + len(a)] = a
    return flat, offs


def ksw_global_batch(queries, targets, wband, mat, o_del, e_del, o_ins,
                     e_ins):
    """queries/targets: lists of nt4 uint8 arrays; wband: [n] int bands.
    Returns (scores [n] i32, cigars: list of [(op, len), ...])."""
    lib = _load()
    n = len(queries)
    q, qo = _cat(queries, np.uint8)
    t, to = _cat(targets, np.uint8)
    wb = np.ascontiguousarray(wband, np.int32)
    m = np.ascontiguousarray(np.asarray(mat, np.int8).reshape(-1))
    scores = np.zeros(n, np.int32)
    ncig = np.zeros(n, np.int32)
    cap = 64
    maxlen = int(max((qo[1:] - qo[:-1]).max(initial=1),
                     (to[1:] - to[:-1]).max(initial=1)))
    while True:
        cig = np.zeros((n, cap), np.uint32)
        rc = lib.ksw_global_batch(
            n, q.ctypes.data_as(_u8p), qo.ctypes.data_as(_i64p),
            t.ctypes.data_as(_u8p), to.ctypes.data_as(_i64p),
            wb.ctypes.data_as(_i32p), m.ctypes.data_as(_i8p),
            o_del, e_del, o_ins, e_ins,
            scores.ctypes.data_as(_i32p), ncig.ctypes.data_as(_i32p),
            cig.ctypes.data_as(_u32p), cap)
        if rc == 0:
            break
        if rc == -2 or cap > 4 * maxlen + 8:
            raise MemoryError("ksw_global_batch native failure")
        cap *= 4
    cigars = [[(int(c & 0xF), int(c >> 4)) for c in cig[b, : ncig[b]]]
              for b in range(n)]
    return scores, cigars


def nm_md_batch(cigars, qsegs, rseqs, is_rev):
    """cigars: list of [(op, len)], qsegs/rseqs: lists of nt4 uint8 arrays,
    is_rev: [n] bool.  Returns (nm [n] i32, md: list of str)."""
    lib = _load()
    n = len(cigars)
    cig_arrs = [np.asarray([(ln << 4) | op for op, ln in cg], np.uint32)
                for cg in cigars]
    cig, cig_off = _cat(cig_arrs, np.uint32)
    q, qo = _cat(qsegs, np.uint8)
    r, ro = _cat(rseqs, np.uint8)
    rev = np.ascontiguousarray(is_rev, np.uint8)
    nm = np.zeros(n, np.int32)
    md_off = np.zeros(n + 1, np.int64)
    cap = int(len(r) * 2 + 16 * n + 64)
    while True:
        buf = ctypes.create_string_buffer(cap)
        need = lib.nm_md_batch(
            n, cig.ctypes.data_as(_u32p), cig_off.ctypes.data_as(_i64p),
            q.ctypes.data_as(_u8p), qo.ctypes.data_as(_i64p),
            r.ctypes.data_as(_u8p), ro.ctypes.data_as(_i64p),
            rev.ctypes.data_as(_u8p), nm.ctypes.data_as(_i32p),
            buf, cap, md_off.ctypes.data_as(_i64p))
        if need == 0:
            break
        cap = max(int(need), cap * 2)
    raw = buf.raw
    md = [raw[int(md_off[b]):int(md_off[b + 1])].decode()
          for b in range(n)]
    return nm, md
