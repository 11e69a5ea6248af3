"""ctypes loader for the native 2-bit packer (pack2.c).

Same build contract as the sibling loaders: compile-on-first-use with the
system gcc, cached next to the source; any failure raises ImportError so
utils/pack2.py keeps its numpy SWAR fallback. The two packers are
byte-identical (fuzz-tested in tests/test_upload.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pack2.c")
_SO = os.path.join(_DIR, "_pack2.so")


def _load() -> ctypes.CDLL:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["gcc", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            raise ImportError(f"native pack2 build failed: {e}")
    lib = ctypes.CDLL(_SO)
    lib.pack_codes_2bit.restype = None
    lib.pack_codes_2bit.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                    ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_ubyte)]
    return lib


_lib = _load()


def pack_codes_2bit(qp: np.ndarray) -> np.ndarray:
    """Native pack: 4 codes/byte, layout-identical to the numpy SWAR."""
    qp = np.ascontiguousarray(qp, dtype=np.uint8)
    out = np.empty(qp.size // 4, np.uint8)
    _lib.pack_codes_2bit(
        qp.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), qp.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out
