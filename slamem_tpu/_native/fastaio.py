"""ctypes loader for the native FASTA parser (fastaio.c).

Compiles the shared object on first use with the system gcc (cached next to
the source); any failure raises ImportError so io/fasta.py falls back to the
numpy parser. The two parsers are contract-identical and cross-tested.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastaio.c")
_SO = os.path.join(_DIR, "_fastaio.so")


def _load() -> ctypes.CDLL:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["gcc", "-O3", "-fPIC", "-shared", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            raise ImportError(f"native fastaio build failed: {e}")
    lib = ctypes.CDLL(_SO)
    lib.fasta_count.restype = ctypes.c_long
    lib.fasta_count.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.fasta_parse.restype = ctypes.c_long
    lib.fasta_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long), ctypes.c_long]
    lib.revcomp_codes.restype = None
    lib.revcomp_codes.argtypes = [ctypes.POINTER(ctypes.c_ubyte),
                                  ctypes.c_long]
    return lib


_lib = _load()


def parse(buf: bytes, source: str = "<bytes>"):
    """Parse FASTA bytes -> FastaSet; contract-identical to parse_fasta_bytes."""
    from slamem_tpu.io.fasta import FastaSet

    if len(buf) == 0:
        raise ValueError(f"{source}: empty FASTA input")
    nmax = _lib.fasta_count(buf, len(buf))
    if nmax < 0:
        raise ValueError(f"{source}: not FASTA (no leading '>' header)")
    codes = np.empty(len(buf), dtype=np.uint8)
    seq_starts = np.empty(nmax + 1, dtype=np.int64)
    name_spans = np.empty(2 * nmax, dtype=np.int64)
    nseq = _lib.fasta_parse(
        buf, len(buf),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        seq_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        name_spans.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        nmax)
    if nseq < 0:
        raise ValueError(f"{source}: malformed FASTA")
    total = int(seq_starts[nseq])
    names = []
    for k in range(nseq):
        off, ln = int(name_spans[2 * k]), int(name_spans[2 * k + 1])
        names.append(buf[off:off + ln].decode("ascii", "replace"))
    starts = seq_starts[:nseq].copy()
    lengths = np.diff(seq_starts[:nseq + 1])
    return FastaSet(names=names, starts=starts, lengths=lengths,
                    codes=codes[:total].copy())
