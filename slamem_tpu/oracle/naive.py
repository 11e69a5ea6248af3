"""Deliberately-simple CPU oracle MEM finder (SURVEY.md §4 item 1).

The reference has no test suite; this oracle is the project's ground truth.
It enumerates every maximal exact match by brute-force diagonal run-length
scanning (O(n*m) work, numpy-vectorized per diagonal) — slow but obviously
correct. Every engine feature (MEM/MUM/MAM, revcomp, multi-FASTA, N handling,
min length) is property-tested against it on inputs up to ~10^5 bp.

Match semantics (mirrors slaMEM per SURVEY.md §2/§7):
  * only A/C/G/T positions can match; N never matches anything (not even N),
    and inter-sequence separators never match, so no match spans an N run or
    a sequence boundary;
  * a MEM (r, q, len) satisfies ref[r:r+len] == query[q:q+len], len >= L,
    and is extendable in neither direction.
"""

from __future__ import annotations

import numpy as np

from slamem_tpu.io.fasta import CODE_N


def find_mems_codes(ref: np.ndarray, query: np.ndarray,
                    min_len: int) -> list[tuple[int, int, int]]:
    """All MEMs between code arrays ``ref`` and ``query``.

    Returns [(ref_pos, query_pos, length)] with 0-based positions into the
    given arrays (``ref`` may contain separators; positions are global).
    """
    ref = np.asarray(ref, dtype=np.uint8)
    query = np.asarray(query, dtype=np.uint8)
    n, m = ref.size, query.size
    out: list[tuple[int, int, int]] = []
    if n == 0 or m == 0 or min_len < 1:
        return out
    for d in range(-(m - 1), n):  # diagonal d = ref_pos - query_pos
        r0, r1 = max(0, d), min(n, m + d)
        if r1 - r0 < min_len:
            continue
        rseg = ref[r0:r1]
        qseg = query[r0 - d:r1 - d]
        eq = (rseg == qseg) & (rseg < CODE_N)
        if not eq.any():
            continue
        # maximal runs of True
        padded = np.concatenate(([False], eq, [False]))
        delta = np.diff(padded.astype(np.int8))
        starts = np.flatnonzero(delta == 1)
        ends = np.flatnonzero(delta == -1)
        for s, e in zip(starts, ends):
            if e - s >= min_len:
                out.append((r0 + int(s), r0 - d + int(s), int(e - s)))
    out.sort(key=lambda t: (t[1], t[0]))
    return out


def count_occurrences(text: np.ndarray, sub: np.ndarray) -> int:
    """Number of (overlapping) exact occurrences of ``sub`` in ``text``.

    ``sub`` is assumed ACGT-only (MEM strings are); N/separator in ``text``
    match nothing because codes differ.
    """
    text = np.asarray(text, dtype=np.uint8)
    sub = np.asarray(sub, dtype=np.uint8)
    k = sub.size
    if k == 0 or text.size < k:
        return 0
    win = np.lib.stride_tricks.sliding_window_view(text, k)
    return int(np.all(win == sub, axis=1).sum())


def filter_mode(mems: list[tuple[int, int, int]], ref: np.ndarray,
                query: np.ndarray, mode: str) -> list[tuple[int, int, int]]:
    """Apply MUM/MAM uniqueness filters (SURVEY.md §3.4).

    mam: keep MEMs whose matched string occurs exactly once in the reference.
    mum: additionally occurs exactly once in the query.
    """
    if mode == "mem":
        return mems
    out = []
    for r, q, ln in mems:
        sub = np.asarray(ref, dtype=np.uint8)[r:r + ln]
        if count_occurrences(ref, sub) != 1:
            continue
        if mode == "mum" and count_occurrences(query, sub) != 1:
            continue
        out.append((r, q, ln))
    return out


def oracle_matches(ref: np.ndarray, query: np.ndarray, min_len: int,
                   mode: str = "mem") -> list[tuple[int, int, int]]:
    """find_mems_codes + filter_mode in one call."""
    return filter_mode(find_mems_codes(ref, query, min_len), ref, query, mode)
