"""Persistent adaptive-shape state: observed workload counts on disk.

The fused seed engine sizes its device buffers (pair capacity, run buffer,
kept-wire buffer, split-expansion residual) from the LAST OBSERVED counts
for (index, k, stride) — in-process, via seed_mode._last_total_cache. A
cold process has no observations, so its first call dispatches the
default-capacity shape family, its second the snapped family, its third the
split plan: three distinct compiled programs where a warm process needs
one. On a tunneled TPU each extra family costs tens of seconds of
compile-cache load/link even when fully cached — the mechanism that pushed
round 3's official bench past the driver's budget (BENCH_r03 rc=124,
VERDICT r3 item #1).

This module persists those counts next to the XLA compile cache, keyed by
content (reference digest, k, stride, padded query length, query
fingerprint) so a fresh process seeds the in-memory cache and dispatches
the SNAPPED + SPLIT shapes on its very first call — one shape family, one
compile-cache hit. Records are performance hints only: a stale or wrong
record mis-sizes a buffer, the overflow falls through to the multi-round
path, and the record is overwritten — correctness never depends on it
(same contract as the in-memory cache it feeds).

Disable with SLAMEM_ADAPTIVE_DISK=0 (tests do, for determinism); relocate
with SLAMEM_ADAPTIVE_PATH.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np

_DISABLED = os.environ.get("SLAMEM_ADAPTIVE_DISK", "1") == "0"
_PATH = os.environ.get(
    "SLAMEM_ADAPTIVE_PATH",
    os.path.join(os.environ.get("SLAMEM_JAX_CACHE",
                                os.path.expanduser("~/.cache/slamem_jax")),
                 "adaptive.json"))
_store: dict | None = None   # lazily-loaded file contents


def _load() -> dict:
    global _store
    if _store is None:
        try:
            with open(_PATH) as f:
                _store = json.load(f)
        except (OSError, ValueError):
            _store = {}
    return _store


def query_fingerprint(query_text: np.ndarray) -> str:
    """Cheap content fingerprint: length + head/tail 64 KiB digests.

    The counts a record predicts depend on the query content; hashing the
    whole of a 50 Mbp query every call is needless — head+tail+length
    distinguishes every input the bench/CLI actually streams, and a
    collision merely mis-sizes a buffer (overflow fallback)."""
    h = hashlib.blake2b(digest_size=8)
    b = np.ascontiguousarray(query_text)
    h.update(str(b.size).encode())
    h.update(b[:65536].tobytes())
    if b.size > 65536:
        h.update(b[-65536:].tobytes())
    return h.hexdigest()


def text_digest(text) -> str:
    """Content digest of a reference code array (host-side, build-time)."""
    b = np.ascontiguousarray(np.asarray(text))
    return hashlib.blake2b(b.tobytes(), digest_size=12).hexdigest()


def record_key(digest: str, k: int, stride: int, m_p: int, qfp: str,
               minlen: int = 0) -> str:
    # minlen is in the key because the kept-wire count the record predicts
    # is POST-min-length-filter: distinct -l values can share (k, stride)
    # (e.g. L=30 and L=35 both plan K=14/S=14) but keep different counts
    return f"{digest}|k{k}|s{stride}|m{m_p}|q{qfp}|l{minlen}"


def get(key: str) -> dict | None:
    if _DISABLED:
        return None
    return _load().get(key)


# Bound on stored records (ADVICE r4): keys include the query fingerprint,
# m_p and minlen, so a long-lived serving process with varied workloads
# would otherwise grow the file — and its per-update rewrite — unboundedly.
# Eviction is insertion-order (oldest first); a re-put refreshes recency.
_MAX_RECORDS = 512


def put(key: str, rec: dict) -> None:
    """Write-through with atomic replace; no-op when the record is stable.

    Before writing, the on-disk store is re-read and merged under ours
    (concurrent processes each contribute their records instead of
    last-writer-wins clobbering), then trimmed to _MAX_RECORDS oldest-first.
    """
    global _store
    if _DISABLED:
        return
    store = _load()
    if store.get(key) == rec:
        return
    store.pop(key, None)   # re-insertion refreshes recency for eviction
    store[key] = rec
    try:
        os.makedirs(os.path.dirname(_PATH), exist_ok=True)
        try:
            with open(_PATH) as f:
                disk = json.load(f)
        except (OSError, ValueError):
            disk = {}
        # disk wins for every key but the one being written: a concurrent
        # process that wrote after our load has the fresher observation
        disk = {**store, **disk}
        disk.pop(key, None)
        disk[key] = rec
        if len(disk) > _MAX_RECORDS:
            for old in list(disk)[:len(disk) - _MAX_RECORDS]:
                del disk[old]
        _store = store = disk
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_PATH),
                                   prefix=".adaptive-")
        with os.fdopen(fd, "w") as f:
            json.dump(store, f)
            f.write("\n")
        os.replace(tmp, _PATH)
    except OSError:
        pass                         # read-only cache dir: hints stay in-RAM
