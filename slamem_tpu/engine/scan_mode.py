"""Scan-mode engine: batched backward-search matching statistics + LCP
shortening — the reference's hot loop (SURVEY.md §3.2), re-shaped for TPU.

The reference walks ONE state machine right-to-left over the query:
backward-extend with LF/occ lookups, and on failure climb parent LCP
intervals until the step succeeds. Here thousands of lanes (one per query
chunk) run that state machine in lockstep under jax.lax control flow:

  * the match depth is CAPPED at L (the minimum match length). The capped
    state at position i — the SA interval of the longest prefix of
    q[i:i+L] that occurs in the reference — is a pure function of the L
    characters ahead, so a lane warming up for L positions before its chunk
    is EXACT: no saturation repair, no cross-chunk dependence (this is the
    idiomatic answer to the reference's sequential scan);
  * shortening uses the branchless PSV/NSV pyramid (kernels/lcp_search.py)
    instead of the reference's sampled-LCP binary search;
  * the produced per-position intervals at depth exactly L feed the same
    pair-expansion / diagonal-run backend as the seed engine
    (engine/seed_mode.py) — both engines are exact for every L and must
    produce identical output (tested).

Seed vs scan: the seed frontend does O(log n) int64 probes per position
against the packed K-mer table (K capped at 31); the scan frontend does O(1)
amortized rank queries per position and yields depth-L intervals directly,
which generates strictly fewer candidate pairs when L > seed_length_cap.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from slamem_tpu.config import Config
from slamem_tpu.index.build import FMIndex, rank_batch
from slamem_tpu.index.lcp import lcp_adjacent
from slamem_tpu.kernels.lcp_search import LcpPyramid, expand, parent_depth

from slamem_tpu.utils.devcache import DevCache

_pyramid_cache = DevCache("lcp_pyramid")


def get_pyramid(index: FMIndex) -> LcpPyramid:
    """LCP pyramid for an index, cached (one per live index object)."""
    key = id(index.sa)
    hit = _pyramid_cache.get(key, index.sa)
    if hit is not None:
        return hit
    lcp = lcp_adjacent(index.text, index.sa)
    pyr = LcpPyramid.build(lcp)
    return _pyramid_cache.put(key, index.sa, pyr)


def _occ_fn(index: FMIndex, rows, kernel: str, interpret: bool = False):
    """Batched occ closure: nibble-SWAR row gather (default), Pallas DMA
    kernel, or the element-gather reference.

    The Pallas path pads the batch to the kernel's 1024-query granule inside
    the closure; under jit the lane count is static so this compiles once.
    """
    if kernel == "nib":
        from slamem_tpu.kernels.rank import rank_rows_nib

        return lambda chars, positions: rank_rows_nib(rows, chars,
                                                      positions)
    if kernel == "pallas":
        from slamem_tpu.kernels.rank import rank_rows

        return lambda chars, positions: rank_rows(rows, chars, positions,
                                                  interpret=interpret)
    return lambda chars, positions: rank_batch(index, chars, positions)


def _backward(index: FMIndex, occ_fn, c: jax.Array, lo: jax.Array,
              hi: jax.Array):
    cc = jnp.clip(c, 0, 3)
    both = jnp.concatenate([lo, hi])
    occ = occ_fn(jnp.concatenate([cc, cc]), both)
    k = lo.shape[0]
    base = index.counts[cc]
    return base + occ[:k], base + occ[k:]


@functools.partial(jax.jit, static_argnames=("L", "lane_block", "kernel",
                                             "interpret"))
def _scan_lanes(index: FMIndex, pyr: LcpPyramid, rows, qt: jax.Array, L: int,
                lane_block: int, kernel: str = "nib",
                interpret: bool = False):
    """Lockstep capped-MS scan; returns (lo, width) at depth L per position."""
    occ_fn = _occ_fn(index, rows, kernel, interpret)
    m = qt.shape[0]
    n = index.n
    B = lane_block
    C = -(-m // B)                      # lanes
    S = B + L                           # steps per lane (L warmup)
    lane_start = jnp.arange(C, dtype=jnp.int32) * B

    l0 = jnp.zeros((C,), jnp.int32)
    r0 = jnp.full((C,), n, jnp.int32)
    d0 = jnp.zeros((C,), jnp.int32)
    out_lo = jnp.zeros((m,), jnp.int32)
    out_w = jnp.zeros((m,), jnp.int32)

    def outer(step, carry):
        l, r, d, out_lo, out_w = carry
        i = lane_start + jnp.int32(S - 1 - step)
        live = (i >= lane_start) & (i < m)
        c = qt[jnp.clip(i, 0, m - 1)].astype(jnp.int32)

        # pre-expansion: a depth-L state must drop to depth L-1 before the
        # next prepend so the cap is preserved
        at_cap = live & (d == jnp.int32(L))
        el, er = expand(pyr, l, r, jnp.full_like(d, L - 1))
        l = jnp.where(at_cap, el, l)
        r = jnp.where(at_cap, er, r)
        d = jnp.where(at_cap, jnp.int32(L - 1), d)

        def cond(state):
            return jnp.any(state[3])

        def body(state):
            l, r, d, pending = state
            l2, r2 = _backward(index, occ_fn, c, l, r)
            l2 = l2.astype(jnp.int32)
            r2 = r2.astype(jnp.int32)
            ok = (c < 4) & (l2 < r2)
            succ = pending & ok
            dead = pending & ~ok & (d == 0)
            shorten = pending & ~ok & (d > 0)
            pd = parent_depth(pyr, l, r)
            sl, sr = expand(pyr, l, r, pd)
            l = jnp.where(succ, l2, jnp.where(dead, 0, jnp.where(shorten, sl, l)))
            r = jnp.where(succ, r2, jnp.where(dead, n, jnp.where(shorten, sr, r)))
            d = jnp.where(succ, d + 1, jnp.where(dead, 0, jnp.where(shorten, pd, d)))
            pending = shorten
            return l, r, d, pending

        l, r, d, _ = jax.lax.while_loop(cond, body, (l, r, d, live))

        record = live & (step >= jnp.int32(L))
        ii = jnp.clip(i, 0, m - 1)
        out_lo = out_lo.at[ii].set(jnp.where(record, l, out_lo[ii]))
        w = jnp.where(d == jnp.int32(L), r - l, 0)
        out_w = out_w.at[ii].set(jnp.where(record, w, out_w[ii]))
        return l, r, d, out_lo, out_w

    _, _, _, out_lo, out_w = jax.lax.fori_loop(
        0, S, outer, (l0, r0, d0, out_lo, out_w))
    return out_lo, out_w


def _want_pallas(rank_kernel: str) -> tuple[str, bool]:
    """Resolve Config.rank_kernel -> (kernel name, interpret).

    'auto' = the nibble-SWAR row-gather path (fastest measured on both TPU
    and CPU, kernels/rank.py r3 A/B); 'pallas'/'xla'/'nib' force one;
    'pallas_interpret' runs the Pallas kernel logic through the interpreter
    (CPU equivalence tests).
    """
    if rank_kernel == "pallas":
        return "pallas", False
    if rank_kernel == "pallas_interpret":
        return "pallas", True
    if rank_kernel == "xla":
        return "xla", False
    return "nib", False


def scan_intervals(index: FMIndex, query_text: np.ndarray, L: int,
                   lane_block: int = 256, rank_kernel: str = "auto"
                   ) -> tuple[jax.Array, jax.Array]:
    """Per-position SA intervals of q[i:i+L] (width 0 where absent)."""
    qt = jnp.asarray(query_text, dtype=jnp.uint8)
    pyr = get_pyramid(index)
    kernel, interpret = _want_pallas(rank_kernel)
    if kernel == "pallas":
        from slamem_tpu.kernels.rank import interleaved_rows

        rows = interleaved_rows(index)
    elif kernel == "nib":
        from slamem_tpu.kernels.rank import nibble_rows

        rows = nibble_rows(index)
    else:
        rows = jnp.zeros((1, 128), jnp.uint32)  # unused placeholder
    lo, w = _scan_lanes(index, pyr, rows, qt, L, lane_block, kernel,
                        interpret)
    return lo, w


# Chunk width for chr-scale scans. The capped-depth state at position i is
# a pure function of q[i:i+L] (the module-docstring exactness argument), so
# the scan may process any slice of the query given L characters of
# lookahead — intervals are identical to the monolithic program's. One
# 50 Mbp lockstep dispatch crashed the TPU worker (round 5, reproducing
# the round-1 incident); 4M-position segments with uniform padded shape
# compile once and bound the program's footprint.
_SCAN_CHUNK = int(os.environ.get("SLAMEM_SCAN_CHUNK", 1 << 22))


def find_scan_matches(index: FMIndex, query_text: np.ndarray, cfg: Config,
                      mesh=None):
    """Scan frontend + shared pair/run backend (see seed_mode)."""
    from slamem_tpu.engine import seed_mode
    from slamem_tpu.io.fasta import CODE_N

    L = cfg.min_length
    # N-padding: no spurious intervals; device copy memoized per query
    qp, qt = seed_mode.query_to_device(query_text)
    m = int(qp.shape[0])
    C = _SCAN_CHUNK
    if m <= C:
        lo, width = scan_intervals(index, qt, L,
                                   rank_kernel=cfg.rank_kernel)
    else:
        los, ws = [], []
        for a in range(0, m, C):
            seg = qt[a:a + C + L]
            if int(seg.shape[0]) < C + L:   # uniform tail shape: N pad
                seg = jnp.concatenate(
                    [seg, jnp.full((C + L - int(seg.shape[0]),), CODE_N,
                                   jnp.uint8)])
            lo_c, w_c = scan_intervals(index, seg, L,
                                       rank_kernel=cfg.rank_kernel)
            take = min(C, m - a)
            los.append(lo_c[:take])
            ws.append(w_c[:take])
        lo = jnp.concatenate(los)
        width = jnp.concatenate(ws)
    # FM hits never touch specials: plain SA doubles as the all-valid
    # sign-augmented view (augment_sa with validity all-true)
    return seed_mode.pairs_to_matches(index, lo, width, L, m, cfg, mesh,
                                      index.sa, qt=qt)
