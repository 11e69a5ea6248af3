"""ctypes loader for the native match-listing formatter (matchfmt.c).

Compiles the shared object on first use (cached next to the source); any
failure raises ImportError so report/format.py falls back to the Python
renderer. The two renderers are byte-identical and cross-tested
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "matchfmt.c")
_SO = os.path.join(_DIR, "_matchfmt.so")


def _load() -> ctypes.CDLL:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["gcc", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            raise ImportError(f"native matchfmt build failed: {e}")
    lib = ctypes.CDLL(_SO)
    I64P = ctypes.POINTER(ctypes.c_int64)
    lib.fmt_lines_single.restype = ctypes.c_long
    lib.fmt_lines_single.argtypes = [I64P, I64P, I64P, ctypes.c_long,
                                     ctypes.c_char_p, ctypes.c_long]
    lib.fmt_lines_multi.restype = ctypes.c_long
    lib.fmt_lines_multi.argtypes = [I64P, I64P, I64P, I64P, ctypes.c_long,
                                    ctypes.c_char_p, I64P, I64P,
                                    ctypes.c_long, ctypes.c_char_p,
                                    ctypes.c_long]
    return lib


_lib = _load()


def _i64(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.int64)


def render_single(rp: np.ndarray, qp: np.ndarray, ln: np.ndarray) -> bytes:
    """Single-reference lines (1-based positions already applied)."""
    n = int(rp.size)
    if n == 0:
        return b""
    rp, qp, ln = _i64(rp), _i64(qp), _i64(ln)
    cap = 80 * n + max(0, len(str(max(int(rp.max()), int(qp.max()),
                                      int(ln.max())))) - 8) * 3 * n
    out = ctypes.create_string_buffer(cap)
    w = _lib.fmt_lines_single(
        rp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ln.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out, cap)
    if w < 0:
        raise ValueError("matchfmt buffer overflow")
    return out.raw[:w]


def render_multi(seq: np.ndarray, rp: np.ndarray, qp: np.ndarray,
                 ln: np.ndarray, names: list[str], name_w: int) -> bytes:
    """Multi-reference lines with a padded name column."""
    n = int(rp.size)
    if n == 0:
        return b""
    seq, rp, qp, ln = _i64(seq), _i64(rp), _i64(qp), _i64(ln)
    name_bytes = [nm.encode() for nm in names]
    blob = b"".join(name_bytes)
    name_len = np.array([len(b) for b in name_bytes], dtype=np.int64)
    name_off = np.concatenate(([0], np.cumsum(name_len)[:-1])).astype(
        np.int64) if len(name_bytes) else np.zeros(0, np.int64)
    per = 80 + name_w + int(name_len.max(initial=0))
    cap = per * n
    out = ctypes.create_string_buffer(cap)
    I64P = ctypes.POINTER(ctypes.c_int64)
    w = _lib.fmt_lines_multi(
        seq.ctypes.data_as(I64P), rp.ctypes.data_as(I64P),
        qp.ctypes.data_as(I64P), ln.ctypes.data_as(I64P), n,
        blob, name_off.ctypes.data_as(I64P),
        name_len.ctypes.data_as(I64P), name_w, out, cap)
    if w < 0:
        raise ValueError("matchfmt buffer overflow")
    return out.raw[:w]
