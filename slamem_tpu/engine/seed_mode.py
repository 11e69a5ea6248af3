"""Seed-and-run MEM engine — the TPU-first flagship query path.

This replaces the reference's sequential right-to-left backward-search loop
(SURVEY.md §3.2) with a fully data-parallel formulation whose every stage is
a batched gather / sort / scan XLA maps directly onto TPU hardware:

  1. pack every query position's K-mer (K = min(L, cap)) into one uint32
     word (K <= 16) or two lexicographically-ordered uint32 words
     (K <= 32) — the hot path never holds a 64-bit value;
  2. find its suffix-array interval by vectorized sorted search against the
     packed K-mers of the reference in SA order (one monotone table);
  3. expand intervals into (diagonal, qpos) candidate pairs under a fixed
     per-round capacity (no dynamic shapes on device);
  4. radix-sort the packed (diagonal, qpos) keys;
  5. maximal matches fall out as runs of consecutive qpos on a diagonal:
     a run [a, b] on diagonal c IS the maximal match (c + a, a, K + b - a).

Why this is correct (proof sketch, engine/seed_mode.py is the only place the
argument lives so it is spelled out):
  * every candidate pair (r, i) satisfies pairLCP(ref[r:], q[i:]) >= K, and
    every pair with pairLCP >= K is produced exactly once;
  * a maximal match of length D >= K >= ... contributes pairs at offsets
    o = 0..D-K (windows fully inside the match), i.e. one maximal run;
  * left/right maximality: a pair adjacent to the run (i = a-1 or b+1 on the
    same diagonal) would force the window to match, contradicting run
    maximality, so ref[c+a-1] != q[a-1] and the length is exactly K + b - a;
  * matches of length in [K, L) are dropped by the final length filter.

MUM/MAM (SURVEY.md §3.4) reduce to occurrence counting over the same pairs:
the occurrences of a match's full string in the reference are exactly the
pairs at its start qpos whose run extends at least as far right — an
equality-keyed count answered by two vectorized searchsorteds, no index
walk needed.

Interval frontends (all exact, one shared backend):
  * sort-join (`_join_intervals`) — one combined variadic sort; best when
    table and query batch are comparable sizes;
  * bucket search (`_bucket_intervals`) — prefix-bucket bracket + bounded
    binary search; best when the table dwarfs the query batch;
  * FM backward scan (engine/scan_mode.py) — survey §3.2 parity engine.
"""

from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from slamem_tpu.config import Config
from slamem_tpu.engine import adaptive
from slamem_tpu.index.build import FMIndex
from slamem_tpu.io.fasta import CODE_N
from slamem_tpu.utils.devcache import DevCache

# ---------------------------------------------------------------------------
# K-mer packing
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "stride"))
def packed_key_words(text: jax.Array, k: int, stride: int = 1
                     ) -> tuple[tuple[jax.Array, ...], jax.Array]:
    """(words, valid) at every stride-th position of a code text, K <= 32.

    words is a tuple of uint32 arrays: word 0 packs chars [i, i+16) base-4,
    word 1 (present when k > 16) packs chars [i+16, i+k). Comparing windows
    word-lexicographically equals comparing their K characters, because word
    0 always covers a fixed 16-char prefix. Packing stops at the first
    special (N/SEP/end): chars from the first special onward contribute 0,
    and valid[i] = window [i, i+k) lies inside the text with no special.

    The truncation rule makes the packed words of an invalid window <= the
    words of any real window sharing its prefix (word-lexicographically),
    which is exactly what keeps the SA-ordered reference table non-decreasing
    (specials sort below A in the index's suffix order) — see seed_table.

    Two uint32 words instead of one int64: 64-bit compares/sorts/gathers
    cost 2-6x on v5e (measured round 1) — the dual-word key removes the
    K=16 collision wall (n*m/4^16 random pairs at chr scale) at int32 speed.

    Validity is a running AND carried through the char loop (ok &= char is
    not special), with the text padded by CODE_N so windows crossing the
    end go invalid the same way — bit-identical words/valid to the older
    next_special cummin formulation, but the 5 Mbp cummin alone cost
    28.5 ms on chip (packprof, round 3) vs ~0 for the carried flag. With
    stride > 1 only every stride-th window is packed (strided slices of
    the padded text), so sparse seeding skips 1-1/stride of the pack work
    instead of packing everything and slicing after.
    """
    n = text.shape[0]
    ns = -(-n // stride)
    padded = jnp.concatenate(
        [text, jnp.full((k + stride,), CODE_N, jnp.uint8)])
    ok = jnp.ones((ns,), jnp.bool_)
    words = []
    for w0 in range(0, k, 16):
        acc = jnp.zeros((ns,), jnp.uint32)
        for t in range(w0, min(w0 + 16, k)):
            if stride == 1:
                ch = jax.lax.slice(padded, (t,), (t + n,))
            else:
                ch = jax.lax.slice(padded, (t,),
                                   (t + (ns - 1) * stride + 1,), (stride,))
            ok = ok & (ch < CODE_N)
            acc = acc * 4 + jnp.where(ok, ch.astype(jnp.uint32),
                                      jnp.uint32(0))
        words.append(acc)
    return tuple(words), ok


@functools.partial(jax.jit, static_argnames=("k",))
def packed_kmers(text: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Single-word (k <= 16) packing — thin wrapper over packed_key_words."""
    assert k <= 16, "packed_kmers is the single-word path; use packed_key_words"
    words, valid = packed_key_words(text, k)
    return words[0], valid


def sampled_query_keys(qt: jax.Array, k: int, stride: int
                       ) -> tuple[tuple[jax.Array, ...], jax.Array]:
    """Packed query K-mer words at every stride-th position.

    THE sparse-seeding sampling convention (choose_stride's exactness
    argument depends on windows being exactly positions 0, S, 2S, ...):
    every frontend — join/bucket, fused or not, replicated or per-slab —
    must sample through this one helper so the convention cannot drift.
    """
    return packed_key_words(qt, k, stride)


def _lex_lt(v: tuple[jax.Array, ...], q: tuple[jax.Array, ...]) -> jax.Array:
    """v < q word-lexicographically (tuples of equal-length uint32 arrays)."""
    lt = jnp.zeros(v[0].shape, jnp.bool_)
    for vw, qw in reversed(list(zip(v, q))):
        lt = (vw < qw) | ((vw == qw) & lt)
    return lt


def _lex_le(v: tuple[jax.Array, ...], q: tuple[jax.Array, ...]) -> jax.Array:
    """v <= q word-lexicographically."""
    le = jnp.ones(v[0].shape, jnp.bool_)
    for vw, qw in reversed(list(zip(v, q))):
        le = (vw < qw) | ((vw == qw) & le)
    return le


def lex_searchsorted(words: tuple[jax.Array, ...],
                     qwords: tuple[jax.Array, ...], side: str) -> jax.Array:
    """searchsorted over a word-lexicographic sorted multi-word key table.

    Plain vectorized binary search (ceil(log2 n) probes, len(words) gathers
    per probe); the perf frontends (_join_intervals / _bucket_intervals)
    avoid it — this serves the distributed paths where the table is a local
    slab.
    """
    n = words[0].shape[0]
    probes = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    m = qwords[0].shape[0]
    cmp = _lex_lt if side == "left" else _lex_le

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        v = tuple(w[jnp.clip(mid, 0, n - 1)] for w in words)
        go = cmp(v, qwords) & (lo < hi)
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go | (lo >= hi), hi, mid)
        return lo, hi

    # fori_loop bounds the peak live set to one probe's gathers (see
    # _bucket_intervals)
    return jax.lax.fori_loop(
        0, probes, body,
        (jnp.zeros((m,), jnp.int32), jnp.full((m,), n, jnp.int32)))[0]


_seed_table_cache = DevCache("seed_table")
_last_total_cache: dict[tuple[int, int], tuple] = {}
# (id(index.sa), k, stride) keys whose split expansion overflowed once —
# the planner stops splitting them (the plain delta-fill path is always
# correct; split is a measured ~8 ms/call optimization for thin widths)
_split_blocklist: set[tuple[int, int, int]] = set()
# (id(index.sa), k, stride) -> (weakref(sa), adaptive-disk record key),
# registered by seed_last_from_disk; _set_last_total writes observations
# through to disk under it so a COLD process dispatches the snapped shape
# family first (VERDICT r3 #1: three shape families made the official
# bench time out). The weakref guards id() reuse like the sibling caches.
_disk_key_of: dict[tuple[int, int, int], tuple] = {}


def _last_total(index: FMIndex, k: int, stride: int = 1
                ) -> tuple[int, int | None, int | None]:
    """Last observed (pair count, run count, kept-run count) for
    (index, k, stride); guarded by (weak) array identity like the sibling
    caches (a recycled id() must not mis-steer the fused-skip heuristic).
    runs / kept are None when the last call went through a path that never
    measured them. kept counts runs surviving the min-length filter — it
    sizes the fused wire (the filter runs on device, so only kept triples
    cross the tunnel)."""
    hit = _last_total_cache.get((id(index.sa), k, stride))
    if hit is not None and hit[0]() is index.sa:
        return hit[1], hit[2], hit[3]
    return 0, None, None


def _last_nonzero(index: FMIndex, k: int, stride: int = 1) -> int | None:
    """Last observed count of samples with width >= 1 (None if unknown).

    last_pairs - last_nonzero is EXACTLY the residual pair mass the split
    expansion must buffer (each nonzero sample contributes its first pair
    directly), so the planner sizes/gates split from it instead of
    guessing from the pair/sample ratio (which chr21 K=14 disproved:
    pairs < samples yet 44% of pairs were residual)."""
    hit = _last_total_cache.get((id(index.sa), k, stride))
    if hit is not None and hit[0]() is index.sa and len(hit) > 4:
        return hit[4]
    return None


def _last_elig(index: FMIndex, k: int, stride: int = 1) -> int | None:
    """Last observed span-ELIGIBLE run count (None if unknown).

    Sizes the intermediate extension buffer on deep-minlen shapes: span-
    eligible runs (>= w_min windows) include sub-minlen true runs that the
    post-extension filter drops, so elig >= kept and the two buffers need
    independent capacities (the wire carries only kept)."""
    hit = _last_total_cache.get((id(index.sa), k, stride))
    if hit is not None and hit[0]() is index.sa and len(hit) > 5:
        return hit[5]
    return None


def _set_last_total(index: FMIndex, k: int, total: int,
                    runs: int | None = None, stride: int = 1,
                    kept: int | None = None,
                    nonzero: int | None = None,
                    elig: int | None = None) -> None:
    if len(_last_total_cache) > 16:
        _last_total_cache.clear()
    _last_total_cache[(id(index.sa), k, stride)] = (
        weakref.ref(index.sa), total, runs, kept, nonzero, elig)
    hit = _disk_key_of.get((id(index.sa), k, stride))
    if hit is not None and hit[0]() is index.sa:
        adaptive.put(hit[1], {
            "pairs": total, "runs": runs, "kept": kept, "nonzero": nonzero,
            "elig": elig,
            "split_blocked": (id(index.sa), k, stride) in _split_blocklist})


def seed_last_from_disk(index: FMIndex, k: int, stride: int, m_p: int,
                        query_text: np.ndarray, minlen: int = 0) -> None:
    """Seed the in-memory adaptive state from the persistent store.

    Registers the disk key for write-through either way; fills
    _last_total_cache / _split_blocklist only when the process has no
    fresher in-memory observation. Records are hints: a stale count
    mis-sizes a buffer and the overflow fallback corrects (and rewrites)
    it — correctness never depends on this store (engine/adaptive.py)."""
    from slamem_tpu.index.build import index_digest

    memkey = (id(index.sa), k, stride)
    dk = adaptive.record_key(index_digest(index), k, stride, m_p,
                             adaptive.query_fingerprint(query_text), minlen)
    if len(_disk_key_of) > 64:
        _disk_key_of.clear()
    _disk_key_of[memkey] = (weakref.ref(index.sa), dk)
    hit = _last_total_cache.get(memkey)
    if hit is not None and hit[0]() is index.sa:
        return    # in-memory observation wins (query-insensitive, as before)
    rec = adaptive.get(dk)
    if rec is None:
        return
    _last_total_cache[memkey] = (weakref.ref(index.sa), int(rec["pairs"]),
                                 rec.get("runs"), rec.get("kept"),
                                 rec.get("nonzero"), rec.get("elig"))
    if rec.get("split_blocked"):
        _split_blocklist.add(memkey)

# fallback rounds may grow their buffers (amortizing dispatch overhead) only
# when the configured capacity is at least this — deliberately small
# capacities keep their semantics. Module-level so tests can exercise the
# grown path at miniature scale.
_GROWTH_MIN_CAPACITY = 1 << 22


def capacity_bucket(total: int, floor_cap: int, ceil_cap: int) -> int:
    """Smallest buffer bucket holding ``total`` pairs with ~3% headroom.

    Buckets are 2^k and 3*2^(k-1) (1M, 1.5M, 2M, 3M, 4M, ...), clamped to
    [floor_cap, ceil_cap]. Measured on v5e (scripts/tpu_experiments.py
    capab): the fused dispatch pays ~35 ms per million buffer slots
    regardless of the live pair count (sort rows, scatters, cumsums are all
    capacity-wide), so the buffer should track the observed pair mass. The
    bucket grid bounds the number of distinct compiled shapes; compiles are
    persistent-cached.
    """
    need = total + max(total // 32, 1024)
    cap = floor_cap
    while cap < need and cap < ceil_cap:
        # 2^k -> 3*2^(k-1) -> 2^(k+1) -> ...
        cap = cap + (cap >> 1) if (cap & (cap - 1)) == 0 else (cap // 3) * 4
    return min(cap, ceil_cap)


def seed_table(index: FMIndex, k: int
               ) -> tuple[tuple[jax.Array, ...], jax.Array]:
    """(refk_words, sa_aug): packed K-mers in SA order + sign-augmented SA.

    refk_words (tuple of uint32 arrays, word-lexicographic) is non-decreasing
    (argued in packed_key_words), so sorted search against it yields the SA
    interval of any ACGT K-mer. Rows whose window touches a special carry the
    sign-bit invalid flag in sa_aug (augment_sa) and are filtered at pair
    expansion. Cached per (index, k): one build serves every query
    sequence/strand.
    """
    key = (id(index.sa), k)
    hit = _seed_table_cache.get(key, index.sa)
    if hit is not None:
        return hit
    words, valid = packed_key_words(index.text, k)
    refk_words = tuple(w[index.sa] for w in words)
    sa_aug = augment_sa(index.sa, valid[index.sa])
    return _seed_table_cache.put(key, index.sa, (refk_words, sa_aug))


# ---------------------------------------------------------------------------
# Seed intervals + capacity-bounded pair expansion (device side)
# ---------------------------------------------------------------------------

@jax.jit
def seed_intervals(refk, qk, qvalid: jax.Array
                   ) -> tuple[jax.Array, jax.Array]:
    """SA interval [lo, lo+width) of every query window's K-mer.

    Accepts single-word arrays or word tuples; int32 out (simple reference
    frontend — the fast paths are _join_intervals / _bucket_intervals).
    """
    refk_w = refk if isinstance(refk, tuple) else (refk,)
    qk_w = qk if isinstance(qk, tuple) else (qk,)
    lo = lex_searchsorted(refk_w, qk_w, side="left")
    hi = lex_searchsorted(refk_w, qk_w, side="right")
    width = jnp.where(qvalid, hi - lo, 0)
    return lo.astype(jnp.int32), width.astype(jnp.int32)


_I32MAX = np.iinfo(np.int32).max

_bucket_cache = DevCache("bucket_table")


@functools.partial(jax.jit, static_argnames=("bbits", "shift"))
def _build_bucket_table(refk0: jax.Array, bbits: int, shift: int):
    """Prefix-bucket starts over the sorted K-mer table (word 0 prefixes).

    starts[b] = first SA row whose K-mer prefix (top bbits of word 0) >= b,
    via scatter-min + reverse cummin — one pass over n. With the table
    sorted, [starts[b], starts[b+1]) brackets every K-mer in bucket b, so
    per-query binary search needs only log2(max bucket) probes instead of
    log2(n).
    """
    n = refk0.shape[0]
    nb = 1 << bbits
    # clamp in the UNSIGNED domain before the int32 cast: sharded slab pads
    # are uint32-max rows, and at shift = 0 (direct table) they would cast
    # to -1 and scatter into bucket 0; clamped they join the last bucket,
    # where their sign-bit-invalid sa_aug drops them at pair expansion
    pref = jax.lax.shift_right_logical(
        refk0, jnp.asarray(shift, refk0.dtype))
    pref = jnp.minimum(pref, jnp.asarray(nb - 1, refk0.dtype)
                       ).astype(jnp.int32)
    starts = jnp.full((nb + 1,), n, jnp.int32).at[
        pref].min(jnp.arange(n, dtype=jnp.int32))
    starts = jax.lax.cummin(starts, reverse=True)
    max_bucket = jnp.max(starts[1:] - starts[:-1])
    return starts, max_bucket


def bucket_table(index: FMIndex, k: int):
    """(starts, shift, probes) for the bucket frontend, cached per index."""
    key = (id(index.sa), k)
    hit = _bucket_cache.get(key, index.sa)
    if hit is not None:
        return hit
    refk_words, _ = seed_table(index, k)
    word0_bits = 2 * min(k, 16)
    # Direct addressing: when ONE word holds the whole K-mer and the table
    # fits next to the index (4^K + 1 int32 <= 64 * n), use bbits = 2K so a
    # bucket is a single key and the interval IS [starts[b], starts[b+1]) —
    # zero binary probes, 2 gathers per sample. At K = 14 that is a 1.07 GB
    # table: cheap against chr-scale indexes, gated off for toy ones.
    if word0_bits <= 28 and (1 << word0_bits) <= max(64 * index.n, 1 << 22):
        bbits, shift = word0_bits, 0
    else:
        bbits = min(word0_bits, 24)
        shift = word0_bits - bbits
    starts, max_bucket = _build_bucket_table(refk_words[0], bbits, shift)
    # a bucket of full-word keys needs no refinement (k <= 16 means word 0
    # is the entire K-mer; k <= 12 lands here through bbits = 24 too)
    if len(refk_words) == 1 and shift == 0:
        probes = 0
    else:
        probes = max(1, int(np.ceil(np.log2(max(int(max_bucket), 2)))) + 1)
    return _bucket_cache.put(key, index.sa, (starts, shift, probes))


# NOTE (round 4, measured dead end — do not re-attempt without new data):
# fusing sa_aug[starts[b]] into the direct bucket table so one access
# returns interval + first-pair ref position LOSES on v5e both ways:
# (a) a (nb+1, 2) int32 table takes tile layout T(8,128) — the 2-wide
#     minor dim pads to 128 lanes, 64x memory (34 GB at K=13; XLA refuses
#     the allocation, and jnp-built copies relayout at ~1 s/dispatch);
# (b) a 1D int64-packed table (sa0 << 32 | starts) keeps the layout sane
#     but the paired int64 slice costs 36 ms device vs 24 ms for the TWO
#     separate int32 accesses it replaces (scripts/tpu_experiments.py
#     saprobe) — the 64-bit gather penalty exceeds the access it saves.
# The engine therefore keeps the separate starts/sa_aug tables.


def _bucket_intervals(refk, starts: jax.Array, qk,
                      qvalid: jax.Array, shift: int, probes: int):
    """Per-query interval bounds via bucket bracket + bounded binary search.

    Cost: 2 gathers into the bucket table + 2*probes*words gathers into refk
    per query — independent of n. Beats the combined-sort join when the
    reference table is much larger than the query batch (chr scale), where
    re-sorting n + m entries per query dominates.
    """
    refk_w = refk if isinstance(refk, tuple) else (refk,)
    qk_w = qk if isinstance(qk, tuple) else (qk,)
    b = jax.lax.shift_right_logical(
        qk_w[0], jnp.asarray(shift, qk_w[0].dtype)).astype(jnp.int32)
    # starts[b] and starts[b+1] are adjacent: one 8 B paired gather instead
    # of two independent random 4 B gathers into the (often GB-scale direct)
    # table — each random gather costs full HBM latency, and the pair was
    # half the 46 ms bucket-search wall at the 5 Mbp headline (packprof r3)
    pair = jax.vmap(
        lambda i: jax.lax.dynamic_slice(starts, (i,), (2,)))(b)
    lo0, hi0 = pair[:, 0], pair[:, 1]
    if probes == 0:
        # direct-addressed table (bucket_table: bbits = full word-0 bits,
        # single word): the bucket IS the key's equivalence class, so the
        # bracket is the interval — no refinement search at all
        width = jnp.where(qvalid, hi0 - lo0, 0).astype(jnp.int32)
        return lo0.astype(jnp.int32), width

    left, right = _bracket_refine(refk_w, qk_w, lo0, hi0, probes)
    width = jnp.where(qvalid, right - left, 0).astype(jnp.int32)
    return left.astype(jnp.int32), width


def _bracket_refine(refk_w: tuple, qk_w: tuple, lo0: jax.Array,
                    hi0: jax.Array, probes: int):
    """Bounded binary refinement of a bucket bracket to the exact interval.

    Shared by the replicated bucket frontend and the per-slab (virtual and
    mesh) sharded frontends — the search itself is frontend-agnostic: any
    sorted word table + bracketing bounds.
    """
    n = refk_w[0].shape[0]

    def search(side_left):
        cmp = _lex_lt if side_left else _lex_le

        # fori_loop, not a Python unroll: at chr scale each probe gathers
        # len(words) m-sized buffers, and ~14 statically-unrolled probes x 2
        # sides made the peak live set OOM a 250 Mbp + 50 Mbp frontend —
        # the loop bounds liveness to one probe's temporaries
        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi) // 2
            v = tuple(w[jnp.clip(mid, 0, n - 1)] for w in refk_w)
            go = cmp(v, qk_w) & (lo < hi)
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go | (lo >= hi), hi, mid)
            return lo, hi

        return jax.lax.fori_loop(0, probes, body, (lo0, hi0))[0]

    return search(True), search(False)


def augment_sa(sa: jax.Array, rowvalid: jax.Array) -> jax.Array:
    """SA with the window-invalid flag folded into the sign bit.

    One gather then serves both the ref position and the validity check in
    pair expansion (gathers are the measured wall on v5e)."""
    return jnp.where(rowvalid, sa, sa | jnp.int32(np.int32(-0x80000000)))


# ---------------------------------------------------------------------------
# Sparse seeding: stride-S query sampling + packed-word endpoint extension
# ---------------------------------------------------------------------------

def choose_seed_plan(n: int, m: int, cfg) -> tuple[int, int, bool]:
    """(k, stride, sparse): the jointly-chosen seed depth and sampling.

    THE single policy entry point — the replicated (find_seed_matches) and
    SA-rank-sharded (dist/sharded.py) engines must agree on (k, stride) or
    their caches and parity guarantees drift. Sparse seeding applies to all
    modes (MUM/MAM uniqueness is decided from the match set alone, see
    apply_mode_filter) but stays sort-backend-only (boundary flags test
    window-adjacent chars, a dense-pair notion).
    """
    sparse = (cfg.sparse_seeds != "off" and cfg.match_backend == "sort")
    k = (choose_seed_k_sparse(n, m, cfg.min_length, cfg.seed_length_cap)
         if sparse
         else choose_seed_k(n, m, cfg.min_length, cfg.seed_length_cap))
    stride = choose_stride(k, cfg.min_length) if sparse else 1
    return k, stride, sparse


def span_w_min(minlen: int, k: int, stride: int) -> int:
    """Minimum aligned-window count a run needs to possibly reach minlen.

    A run of w windows covers at most k + (w-1)*stride + 2*(stride-1)
    characters (endpoint extension moves each boundary < stride chars —
    choose_stride's bounded-extension argument), so runs below this bound
    are provably dead and both extension tails drop them pre-extension.
    """
    span_need = minlen - k - 2 * (stride - 1)
    return (-(-span_need // stride) + 1) if span_need > 0 else 1


def choose_stride(k: int, min_length: int) -> int:
    """Query-seed sampling stride S = min(16, K, L-K+1) — exact for MEMs.

    Seeding only query positions p ≡ 0 (mod S) is exact for MEM mode:

      * coverage: a match of length l >= L contains >= 1 aligned window,
        because the window-start range [s, s+l-K] has length l-K+1 >= S;
      * contiguity: S <= K makes consecutive aligned windows overlap or
        abut, so a run of consecutive sample indices on one diagonal
        certifies one contiguous match covering [si_s*S, si_e*S + K);
      * 1:1 runs<->MEMs: the aligned window one stride beyond either run
        end straddles the flanking mismatch/special (it starts <= that
        boundary and ends past it since S <= K), so it always fails — a
        run can neither merge two MEMs nor split one;
      * bounded extension: if S chars beyond a run end matched, the next
        aligned window would be in the run — so the true boundary lies
        < S <= 16 chars out, recoverable from ONE packed-word compare per
        side (_extend_core).

    The pair tables shrink ~S-fold and the sort-join's query rows m -> m/S;
    the reference has no counterpart (slaMEM walks every position
    sequentially) — this is the batched analogue of sparseMEM-style
    sampling, applied query-side.
    """
    return max(1, min(16, k, min_length - k + 1))


@jax.jit
def ext_arrays(text: jax.Array):
    """Endpoint-extension tables for one code text: (fx, fxl, lvl, lvr).

    fx[i]  packs chars [i, i+16)  base-4, char i   most significant;
    fxl[i] packs chars [i-16, i)  base-4, char i-16 most significant;
    both length n+1, out-of-range chars 0, specials packed as (code & 3) —
    NOT truncated like packed_key_words (truncation would corrupt exactly
    the digits extension reads). False matches through a special/edge are
    impossible because every extension is clamped by the distance-to-
    special arrays: lvr[i] = ordinary chars starting at i, lvl[i] =
    ordinary chars immediately left of i (both capped at 16; text start,
    end, N and separators all count as special).
    """
    n = text.shape[0]
    pos = jnp.arange(n + 1, dtype=jnp.int32)
    base = (text & jnp.uint8(3)).astype(jnp.uint32)
    pad_r = jnp.concatenate([base, jnp.zeros((16,), jnp.uint32)])
    pad_l = jnp.concatenate([jnp.zeros((16,), jnp.uint32), base])
    fx = jnp.zeros((n + 1,), jnp.uint32)
    fxl = jnp.zeros((n + 1,), jnp.uint32)
    for t in range(16):
        fx = fx * 4 + pad_r[t:t + n + 1]
        fxl = fxl * 4 + pad_l[t:t + n + 1]
    spec = text >= CODE_N
    special_at = jnp.where(spec, pos[:n], n)
    nxt = jax.lax.cummin(special_at, reverse=True)
    nxt1 = jnp.concatenate([nxt, jnp.full((1,), n, jnp.int32)])
    lvr = jnp.clip(nxt1 - pos, 0, 16).astype(jnp.uint8)
    prev = jax.lax.cummax(jnp.where(spec, pos[:n], -1))
    prev1 = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev])
    lvl = jnp.clip(pos - 1 - prev1, 0, 16).astype(jnp.uint8)
    return fx, fxl, lvl, lvr


_ext_cache = DevCache("ext_table")
_query_ext_cache = DevCache("query_ext")


def ext_table(index: FMIndex):
    """ext_arrays(index.text), cached per index like seed_table."""
    key = id(index.sa)
    hit = _ext_cache.get(key, index.sa)
    if hit is not None:
        return hit
    return _ext_cache.put(key, index.sa, ext_arrays(index.text))


def query_ext_table(qt: jax.Array):
    """ext_arrays(qt), cached per query device array.

    The query-side extension tables were recomputed INSIDE every fused
    dispatch (and every _finalize_strided call): two O(m) cummin/cummax
    scans plus the 16-digit packing — XLA scans are the slow primitive on
    v5e (a 5 Mbp cummin alone measured 28.5 ms, r3 packprof), so at
    chr-scale a triple-digit-ms recomputation rode along with every
    query. One compute per query object, same identity-guard contract as
    query_to_device."""
    key = id(qt)
    hit = _query_ext_cache.get(key, qt)
    if hit is not None:
        return hit
    return _query_ext_cache.put(key, qt, ext_arrays(qt))


def _ctz_digits(x: jax.Array) -> jax.Array:
    """Trailing zero base-4 digits of a uint32 (16 for x == 0)."""
    tz = jax.lax.population_count(~x & (x - jnp.uint32(1)))
    return (tz >> 1).astype(jnp.int32)


def _clz_digits(x: jax.Array) -> jax.Array:
    """Leading zero base-4 digits of a uint32 (16 for x == 0)."""
    y = x
    y = y | (y >> 1)
    y = y | (y >> 2)
    y = y | (y >> 4)
    y = y | (y >> 8)
    y = y | (y >> 16)
    clz = jnp.uint32(32) - jax.lax.population_count(y)
    return (clz >> 1).astype(jnp.int32)


def _extend_core(diag, qs_s, qe_s, n_runs, ext_r, ext_q,
                 stride: int, k: int):
    """Extend certified run cores to exact match boundaries.

    Inputs are run triples with TRUE diagonal (refpos - qpos) and sample-
    space qstart/qend; only slots < n_runs are meaningful. Each side is one
    gathered packed-word compare: matching trailing digits of the windows
    ending at the start boundary (left), matching leading digits of the
    windows starting at the end boundary (right), clamped by the distance-
    to-special arrays. choose_stride's argument bounds the true extension
    by S-1 <= 15, so one 16-char word per side always suffices.

    Returns position-space (qstart', qend') with the dense-run convention
    length = K + qend' - qstart' (i.e. qend' = qe_s*S + extR).
    """
    fxr, fxlr, lvlr, lvrr = ext_r
    fxq, fxlq, lvlq, lvrq = ext_q
    n = fxr.shape[0] - 1
    m = fxq.shape[0] - 1
    valid = jnp.arange(diag.shape[0], dtype=jnp.int32) < n_runs
    qs = qs_s * jnp.int32(stride)
    qe_b = qe_s * jnp.int32(stride) + jnp.int32(k)   # exclusive core end
    rs = jnp.clip(qs + diag, 0, n)
    rb = jnp.clip(qe_b + diag, 0, n)
    qsc = jnp.clip(qs, 0, m)
    qbc = jnp.clip(qe_b, 0, m)
    dl = _ctz_digits(fxlq[qsc] ^ fxlr[rs])
    ext_l = jnp.minimum(jnp.minimum(dl, lvlq[qsc].astype(jnp.int32)),
                        lvlr[rs].astype(jnp.int32))
    dr = _clz_digits(fxq[qbc] ^ fxr[rb])
    ext_r_ = jnp.minimum(jnp.minimum(dr, lvrq[qbc].astype(jnp.int32)),
                         lvrr[rb].astype(jnp.int32))
    qstart = jnp.where(valid, qs - ext_l, -1)
    qend = jnp.where(valid, qe_s * jnp.int32(stride) + ext_r_, -1)
    return qstart, qend


@functools.partial(jax.jit, static_argnames=("stride", "k"))
def extend_runs(diag, qs_s, qe_s, n_runs, ext_r, ext_q, stride: int, k: int):
    """Standalone extension dispatch for the multi-round sparse path:
    host-merged sample-space runs in, position-space boundaries out."""
    return _extend_core(diag, qs_s, qe_s, n_runs, ext_r, ext_q, stride, k)


def _expand_seg(lo: jax.Array, width: jax.Array, capacity: int):
    """Shared ragged-expansion skeleton: per-slot segment id + SA index.

    Returns (seg_c, sa_idx_raw, in_range): slot i of the capacity-wide pair
    buffer belongs to query-position segment seg_c[i] and points at SA row
    sa_idx_raw[i] (unclipped). Segment bases partition [0, total) with no
    gaps (base[s+1] = ends[s]), so the membership tests t >= 0 and
    t < width[seg] hold by construction and are NOT re-checked.

    Cost discipline (v5e prof2/prof3 batteries, 32M slots): a scatter is
    ~0.5 s, a per-slot gather 0.5-1.0 s, a cumsum 0.04 s. Both per-slot
    values are therefore DELTA FILLS — scatter each segment's value delta
    at its base slot and cumsum (duplicate bases telescope under add, so
    zero-width segments cancel exactly; int32 wraparound in a delta also
    cancels, the running sum always equals an in-range value). Two
    scatter+cumsum pairs (~1.0 s) replace the round-1 scatter-max + cummax
    + two block-table gathers (~2.5 s):

      * segment id: delta +1 per segment  -> cnt fill - 1;
      * SA index:   rel = lo - base       -> sa_idx = slot + rel fill.

    Query positions are recovered arithmetically by callers as
    q_start + seg_c (expansion blocks are always contiguous position
    ranges).
    """
    w32 = width.astype(jnp.int32)
    ends = jnp.cumsum(w32)
    base = ends - w32
    nseg = w32.shape[0]
    bidx = jnp.clip(base, max=capacity)               # capacity row drops
    rel = lo.astype(jnp.int32) - base                 # block-sized
    drel = jnp.concatenate([rel[:1], rel[1:] - rel[:-1]])
    cnt = jnp.zeros((capacity,), jnp.int32).at[bidx].add(1, mode="drop")
    acc = jnp.zeros((capacity,), jnp.int32).at[bidx].add(drel, mode="drop")
    seg_c = jnp.clip(jnp.cumsum(cnt) - 1, 0, nseg - 1)
    slot = jnp.arange(capacity, dtype=jnp.int32)
    sa_idx_raw = slot + jnp.cumsum(acc)
    in_range = slot < ends[nseg - 1]
    return seg_c, sa_idx_raw, in_range


def _expand_pairs_core(sa_aug: jax.Array, lo: jax.Array,
                       width: jax.Array, q_start, m_off: jax.Array,
                       capacity: int, stride: int = 1
                       ) -> tuple[jax.Array, jax.Array]:
    """Ragged expansion + lexicographic sort, all in int32.

    Returns (diag_sorted, qpos_sorted): candidate pairs as
    diag' = refpos - qpos + m_off (int32, positive) and qpos (int32),
    sorted by (diag', qpos); invalid slots carry (_I32MAX, _I32MAX) and sort
    last. Measured on v5e: int64 keys cost 2-6x across sort/gather/compare
    and XLA's searchsorted seg-id lowering another ~25x vs scatter+cummax —
    this function is why the engine holds no 64-bit value on the hot path.

    ``sa_aug`` is the augment_sa view: SA value plus a sign-bit invalid flag
    per row; row-indexed so it shards alongside SA slabs (dist/sharded.py).
    ``q_start`` is the scalar query position of segment 0 — expansion blocks
    are contiguous, so qpos = q_start + seg (no per-slot gather).
    """
    seg_c, sa_idx_raw, in_range = _expand_seg(lo, width, capacity)
    sa_idx = jnp.clip(sa_idx_raw, 0, sa_aug.shape[0] - 1)
    refpos_f = sa_aug[sa_idx]
    refpos = refpos_f & jnp.int32(0x7FFFFFFF)
    qp = jnp.asarray(q_start, jnp.int32) + seg_c
    ok = in_range & (refpos_f >= 0)
    # sparse seeding: segments are SAMPLE indices; the diagonal uses the
    # true query position qp*stride while the sort's q column keeps the
    # sample index, so run compaction's qpos+1 adjacency test detects
    # consecutive SAMPLES (choose_stride's contiguity argument)
    qpos = qp * jnp.int32(stride) if stride != 1 else qp
    d = jnp.where(ok, refpos - qpos + m_off.astype(jnp.int32), _I32MAX)
    q = jnp.where(ok, qp, _I32MAX)
    d_s, q_s = jax.lax.sort((d, q), dimension=0, num_keys=2)
    return d_s, q_s


def _expand_pairs_split(sa_aug: jax.Array, lo: jax.Array, width: jax.Array,
                        m_off: jax.Array, resid_k: int, resid_cap: int,
                        stride: int = 1
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Split ragged expansion for thin width distributions.

    At the 5 Mbp headline 77% of samples have width exactly 1 and only
    1.5% have width >= 2 (splitprof r3 histogram), yet _expand_seg pays
    its scatter+cumsum skeleton over the full pair capacity. Split:

      * part A — every sample's FIRST pair by direct gather (no scatter);
      * part B — the width>=2 samples' REMAINDERS (lo+1, w-1), selected
        by compaction (at most resid_k of them), through the ordinary
        delta-fill into a small resid_cap buffer.

    Returns (d_sorted, q_sorted, overflow): bit-identical sorted pairs to
    _expand_pairs_core (measured equal at the headline) unless overflow —
    a wide sample missed top_k or the remainders overflow resid_cap — in
    which case pairs may be missing and the CALLER MUST DISCARD the result
    (the fused wire reports n_runs = int32max so the host falls through to
    the multi-round path, which recomputes from lo/width).
    """
    ns = lo.shape[0]
    nmax = sa_aug.shape[0] - 1
    slot = jnp.arange(ns, dtype=jnp.int32)
    sa0 = sa_aug[jnp.clip(lo, 0, nmax)]
    ok_a = (width >= 1) & (sa0 >= 0)
    ref_a = sa0 & jnp.int32(0x7FFFFFFF)
    qpos_a = slot * jnp.int32(stride) if stride != 1 else slot
    d_a = jnp.where(ok_a, ref_a - qpos_a + m_off, _I32MAX)
    q_a = jnp.where(ok_a, slot, _I32MAX)

    # select the width>=2 samples by COMPACTION (cumsum + drop-scatter)
    # instead of lax.top_k: same remainder pair set — every width>=2
    # sample lands in part B or trips overflow either way, and unselected
    # default slots carry w_b = 0 so they cancel in the delta fill.
    # Measured NEUTRAL on-chip at the headline (splitprof2: 49.2 vs 51.2
    # Mbp/s, within tunnel variance) — kept for the sharper overflow test
    # ("MORE than resid_k wide samples"; top_k's wv[resid_k-1] >= 2 also
    # fired when the count was exactly resid_k) and the simpler op set.
    wide = width >= 2
    n_wide = jnp.sum(wide, dtype=jnp.int32)
    widx = jnp.cumsum(wide.astype(jnp.int32)) - 1
    bslot = jnp.where(wide, jnp.minimum(widx, resid_k), resid_k)
    wi = jnp.zeros((resid_k,), jnp.int32).at[bslot].set(slot, mode="drop")
    wv = jnp.zeros((resid_k,), jnp.int32).at[bslot].set(width, mode="drop")
    lo_b = lo[wi] + jnp.int32(1)
    w_b = jnp.maximum(wv - 1, 0)
    seg_c, sa_idx_raw, in_range = _expand_seg(lo_b, w_b, resid_cap)
    sb = sa_aug[jnp.clip(sa_idx_raw, 0, nmax)]
    qidx = wi[jnp.clip(seg_c, 0, resid_k - 1)]
    ok_b = in_range & (sb >= 0)
    ref_b = sb & jnp.int32(0x7FFFFFFF)
    qpos_b = qidx * jnp.int32(stride) if stride != 1 else qidx
    d_b = jnp.where(ok_b, ref_b - qpos_b + m_off, _I32MAX)
    q_b = jnp.where(ok_b, qidx, _I32MAX)

    d_s, q_s = jax.lax.sort((jnp.concatenate([d_a, d_b]),
                             jnp.concatenate([q_a, q_b])),
                            dimension=0, num_keys=2)
    resid_total = jnp.sum(jnp.maximum(width - 1, 0).astype(jnp.int64))
    overflow = (n_wide > resid_k) | (resid_total > resid_cap)
    return d_s, q_s, overflow


@functools.partial(jax.jit, static_argnames=("k", "stride"))
def query_frontend(refk, qt: jax.Array, k: int, stride: int = 1):
    """Fused packing + sorted search + planning stats: one dispatch.

    Also returns the device-resident width cumsum and a tiny summary
    (total pairs, max width) so round planning needs only scalar fetches —
    shipping the full width array to the host costs tens of MB per query on
    tunneled backends. stride > 1: intervals for SAMPLE positions only.
    """
    qk_w, qvalid = sampled_query_keys(qt, k, stride)
    lo, width = _join_intervals(refk, qk_w, qvalid)
    cum = jnp.cumsum(width.astype(jnp.int64))
    summary = jnp.stack([cum[-1], jnp.max(width).astype(jnp.int64)])
    return lo, width, cum, summary


@functools.partial(jax.jit, static_argnames=("k", "shift", "probes",
                                             "stride"))
def query_frontend_bucket(refk, starts, qt: jax.Array, k: int, shift: int,
                          probes: int, stride: int = 1):
    """query_frontend with the bucket search instead of the sort join."""
    qk_w, qvalid = sampled_query_keys(qt, k, stride)
    lo, width = _bucket_intervals(refk, starts, qk_w, qvalid, shift, probes)
    cum = jnp.cumsum(width.astype(jnp.int64))
    summary = jnp.stack([cum[-1], jnp.max(width).astype(jnp.int64)])
    return lo, width, cum, summary


def _join_intervals(refk, qk, qvalid: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """Both SA-interval bounds of every query K-mer from ONE combined sort.

    Sort (key words..., tag, idx) with refs tagged 0 and queries 1: within a
    run of equal keys all refs precede all queries, so for a query at sorted
    slot p with run start rs, refs-before-run-start = its LEFT bound and
    refs-up-to-p = its RIGHT bound — one variadic int32-friendly sort plus
    cumsum/cummax, instead of two sort-method searchsorteds that each re-sort
    the query side.
    """
    refk_w = refk if isinstance(refk, tuple) else (refk,)
    qk_w = qk if isinstance(qk, tuple) else (qk,)
    n = refk_w[0].shape[0]
    m = qk_w[0].shape[0]
    keys = tuple(jnp.concatenate([rw, qw]) for rw, qw in zip(refk_w, qk_w))
    # tag and index share ONE column: refs carry 0, query i carries i+1 —
    # refs still sort before queries within an equal-key run, and the sort
    # moves one less 4-byte column (the dominant cost at chr scale where
    # n + m is tens of millions of rows)
    tagidx = jnp.concatenate([jnp.zeros((n,), jnp.int32),
                              jnp.arange(1, m + 1, dtype=jnp.int32)])
    sorted_ops = jax.lax.sort((*keys, tagidx), dimension=0,
                              num_keys=len(keys) + 1)
    keys_s = sorted_ops[:len(keys)]
    tagidx_s = sorted_ops[-1]
    is_ref = (tagidx_s == 0).astype(jnp.int32)
    crefs = jnp.cumsum(is_ref, dtype=jnp.int32)        # inclusive
    excl = crefs - is_ref                              # refs strictly before
    same_key = jnp.ones((n + m - 1,), jnp.bool_)
    for ks in keys_s:
        same_key = same_key & (ks[1:] == ks[:-1])
    new_run = jnp.concatenate([jnp.ones((1,), jnp.bool_), ~same_key])
    # left bound = excl at the slot's run start; excl is non-decreasing, so
    # a cummax fill replaces the (run-start positions, excl[rs]) gather —
    # per-slot gathers are the measured v5e wall, cummaxes are ~15x cheaper
    left = jax.lax.cummax(jnp.where(new_run, excl, -1))
    right = crefs  # == excl at query slots
    q_slot = tagidx_s > 0
    scatter_idx = jnp.where(q_slot, tagidx_s - 1, m)
    lo = jnp.zeros((m,), jnp.int32).at[scatter_idx].set(left, mode="drop")
    hi = jnp.zeros((m,), jnp.int32).at[scatter_idx].set(right, mode="drop")
    width = jnp.where(qvalid, hi - lo, 0).astype(jnp.int32)
    return lo, width


@jax.jit
def _lazy_cum(width: jax.Array) -> jax.Array:
    """int64 width cumsum for the overflow planner — one small extra
    dispatch on the rare fallback, instead of an XLA scan in every fused
    call (_fused_tail's summary needs only sum/max reduces)."""
    return jnp.cumsum(width.astype(jnp.int64))


@jax.jit
def _plan_bounds(cum: jax.Array, grid: jax.Array) -> jax.Array:
    return jnp.searchsorted(cum, grid, side="left") + 1


def plan_blocks_on_device(cum: jax.Array, summary: np.ndarray, capacity: int,
                          block: int, m: int) -> list[tuple[int, int]]:
    """Round planning with O(1) host traffic.

    Blocks are cut on a uniform pair-count grid of step (capacity - max_w):
    a block covering cumulative range [g, g + step) holds at most
    step + max_w - 1 <= capacity - 1 pairs, so every round fits. Long blocks
    are then split to the position-block size (pure index arithmetic).
    """
    total, max_w = int(summary[0]), int(summary[1])
    if total == 0:
        return []
    if max_w >= capacity:
        raise NotImplementedError(
            f"a query position has interval width {max_w} >= "
            f"pair_capacity {capacity}; raise pair_capacity")
    step = capacity - max_w
    nrounds = -(-total // step)
    grid = jnp.arange(1, nrounds + 1, dtype=jnp.int64) * step
    bounds = np.asarray(_plan_bounds(cum, grid))
    blocks: list[tuple[int, int]] = []
    prev = 0
    for b in bounds:
        end = min(int(b), m)
        if end <= prev:
            continue
        while end - prev > block:
            blocks.append((prev, prev + block))
            prev += block
        blocks.append((prev, end))
        prev = end
    if prev < m:
        while m - prev > block:
            blocks.append((prev, prev + block))
            prev += block
        blocks.append((prev, m))
    return blocks


def _block_slices(lo_full, w_full, start, limit, block: int):
    """Fixed-shape block slicing: slice [start, start+block) inside the
    program (lax.dynamic_slice) so every round reuses ONE compilation —
    variable host-side slicing used to trigger a multi-minute XLA compile
    per round on remote backends. Positions >= limit contribute nothing
    (the planner's true block end); callers pre-pad lo/w by `block` zeros so
    the slice never clamps. Returns the scalar block start (int32) as the
    expansion cores' q_start — block positions are contiguous."""
    lo = jax.lax.dynamic_slice(lo_full, (start,), (block,))
    w = jax.lax.dynamic_slice(w_full, (start,), (block,))
    qpos0 = (start.astype(jnp.int32)
             + jnp.arange(block, dtype=jnp.int32))
    w = jnp.where(qpos0.astype(limit.dtype) < limit, w,
                  jnp.zeros((), w.dtype))
    return lo, w, start.astype(jnp.int32)


def _expand_flags_core(text: jax.Array, qt: jax.Array, sa_aug: jax.Array,
                       lo: jax.Array, width: jax.Array, q_start,
                       m_off: jax.Array, k: int, capacity: int,
                       run_capacity: int):
    """Ragged expansion + CHARACTER-FLAG run boundaries — no pair sort.

    A pair (r, i) at seed depth k means ref[r..r+k) == q[i..i+k). Its
    predecessor pair (r-1, i-1) exists iff ref[r-1] == q[i-1] with both
    ordinary bases (N/SEP/edge never match), and its successor iff
    ref[r+k] == q[i+k] likewise — ONE gathered character comparison per
    side. Run starts/ends are therefore computable per pair, in expansion
    order, with no (diag, qpos) sort at all; and the flags are GLOBAL
    properties of the pair, so block/round/shard partitioning cannot
    fragment a run. The host pairs the k-th start with the k-th end per
    diagonal (runs on a diagonal are disjoint and ordered) over arrays the
    size of the RUN count, not the pair count.

    Alternative MEM backend (Config.match_backend = "boundary"): it trades
    the pair sort for four boundary-character gathers per pair. On v5e the
    2-column int32 sort is cheaper than the gathers it saves (prof2
    battery: 0.15 s vs ~1.5 s at 32M), so "sort" is the default; the flag
    backend remains for its partition-invariance and as the A/B surface.
    """
    seg_c, sa_idx_raw, in_range = _expand_seg(lo, width, capacity)
    sa_idx = jnp.clip(sa_idx_raw, 0, sa_aug.shape[0] - 1)
    refpos_f = sa_aug[sa_idx]
    refpos = refpos_f & jnp.int32(0x7FFFFFFF)
    qp = jnp.asarray(q_start, jnp.int32) + seg_c
    ok = in_range & (refpos_f >= 0)

    n = text.shape[0]
    m = qt.shape[0]
    spec = jnp.uint8(4)
    c1 = jnp.where(refpos > 0, text[jnp.clip(refpos - 1, 0)], spec)
    d1 = jnp.where(qp > 0, qt[jnp.clip(qp - 1, 0)], spec)
    c2 = jnp.where(refpos + k < n, text[jnp.clip(refpos + k, max=n - 1)],
                   spec)
    d2 = jnp.where(qp + k < m, qt[jnp.clip(qp + k, max=m - 1)], spec)
    is_start = ok & ((c1 >= 4) | (d1 >= 4) | (c1 != d1))
    is_end = ok & ((c2 >= 4) | (d2 >= 4) | (c2 != d2))

    diag = refpos - qp + m_off.astype(jnp.int32)
    sidx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    eidx = jnp.cumsum(is_end.astype(jnp.int32)) - 1
    drop = jnp.int32(run_capacity)
    sd = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_start, sidx, drop)].set(diag, mode="drop")
    sq = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_start, sidx, drop)].set(qp, mode="drop")
    ed = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_end, eidx, drop)].set(diag, mode="drop")
    eq = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_end, eidx, drop)].set(qp, mode="drop")
    n_starts = jnp.sum(is_start, dtype=jnp.int32)
    n_ends = jnp.sum(is_end, dtype=jnp.int32)
    n_pairs = jnp.sum(ok, dtype=jnp.int32)
    return sd, sq, ed, eq, n_starts, n_ends, n_pairs


@functools.partial(jax.jit,
                   static_argnames=("k", "capacity", "run_capacity",
                                    "block"))
def expand_block_to_boundaries(text, qt, sa_aug, lo_full, w_full, start,
                               limit, m_off, k: int, capacity: int,
                               run_capacity: int, block: int):
    """Fixed-shape boundary-flag backend for one position block."""
    lo, w, q_start = _block_slices(lo_full, w_full, start, limit, block)
    return _expand_flags_core(text, qt, sa_aug, lo, w, q_start, m_off, k,
                              capacity, run_capacity)


class BoundaryBatch:
    """Accumulates start/end boundary events across rounds/shards."""

    def __init__(self) -> None:
        self.sd: list[np.ndarray] = []
        self.sq: list[np.ndarray] = []
        self.ed: list[np.ndarray] = []
        self.eq: list[np.ndarray] = []

    def add(self, sd, sq, ed, eq, ns: int, ne: int) -> None:
        self.sd.append(np.asarray(sd[:ns], np.int64))
        self.sq.append(np.asarray(sq[:ns], np.int64))
        self.ed.append(np.asarray(ed[:ne], np.int64))
        self.eq.append(np.asarray(eq[:ne], np.int64))

    def add_host_pairs(self, ref_codes: np.ndarray, q_codes: np.ndarray,
                       k: int, d: np.ndarray, q: np.ndarray,
                       m_off: int) -> None:
        """Exact global flags computed on host from raw (diag', qpos) pairs
        (the run-capacity-overflow fallback)."""
        sel = d != np.iinfo(np.int32).max
        dd = d[sel].astype(np.int64)
        qq = q[sel].astype(np.int64)
        r = dd - m_off + qq
        n = len(ref_codes)
        m = len(q_codes)
        c1 = np.where(r > 0, ref_codes[np.clip(r - 1, 0, None)], 4)
        d1 = np.where(qq > 0, q_codes[np.clip(qq - 1, 0, None)], 4)
        c2 = np.where(r + k < n, ref_codes[np.clip(r + k, None, n - 1)], 4)
        d2 = np.where(qq + k < m, q_codes[np.clip(qq + k, None, m - 1)], 4)
        is_start = (c1 >= 4) | (d1 >= 4) | (c1 != d1)
        is_end = (c2 >= 4) | (d2 >= 4) | (c2 != d2)
        self.sd.append(dd[is_start])
        self.sq.append(qq[is_start])
        self.ed.append(dd[is_end])
        self.eq.append(qq[is_end])

    def runs(self, m_off: int) -> RunBatch:
        sd = np.concatenate(self.sd) if self.sd else np.zeros(0, np.int64)
        sq = np.concatenate(self.sq) if self.sq else np.zeros(0, np.int64)
        ed = np.concatenate(self.ed) if self.ed else np.zeros(0, np.int64)
        eq = np.concatenate(self.eq) if self.eq else np.zeros(0, np.int64)
        os_ = _sort_diag_qstart(sd, sq)
        oe_ = _sort_diag_qstart(ed, eq)
        # k-th start on a diagonal pairs with k-th end: runs on a diagonal
        # are disjoint, so sorted-by-(diag, qpos) starts and ends align
        return RunBatch(sd[os_] - m_off, sq[os_], eq[oe_])


def _compact_pair_runs(d_s, q_s, run_capacity: int):
    """Sorted (diag, qpos) pairs -> run boundary triples, all int32."""
    valid = d_s != _I32MAX
    pd = jnp.concatenate([jnp.full((1,), -2, jnp.int32), d_s[:-1]])
    pq = jnp.concatenate([jnp.full((1,), -2, jnp.int32), q_s[:-1]])
    nd = jnp.concatenate([d_s[1:], jnp.full((1,), -2, jnp.int32)])
    nq = jnp.concatenate([q_s[1:], jnp.full((1,), -2, jnp.int32)])
    is_start = valid & ((d_s != pd) | (q_s != pq + 1))
    is_end = valid & ((d_s != nd) | (q_s != nq - 1))
    ridx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    drop = jnp.int32(run_capacity)
    run_d = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_start, ridx, drop)].set(d_s, mode="drop")
    run_qs = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_start, ridx, drop)].set(q_s, mode="drop")
    run_qe = jnp.full((run_capacity,), -1, jnp.int32).at[
        jnp.where(is_end, ridx, drop)].set(q_s, mode="drop")
    return run_d, run_qs, run_qe, jnp.sum(is_start), jnp.sum(valid)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "run_capacity", "block",
                                    "stride"))
def expand_block_to_runs(sa_aug, lo_full, w_full, start, limit,
                         m_off, capacity: int, run_capacity: int,
                         block: int, stride: int = 1):
    """Fixed-shape MEM fast path, int32 end to end: expansion, pair sort and
    run compaction without one 64-bit value; only run boundaries (3 int32
    arrays of run_capacity) leave the device. With stride > 1 the block
    covers SAMPLE positions and the emitted triples are sample-space
    (extension happens once, after the host merges round fragments)."""
    lo, w, q_start = _block_slices(lo_full, w_full, start, limit, block)
    d_s, q_s = _expand_pairs_core(sa_aug, lo, w, q_start, m_off, capacity,
                                  stride)
    return _compact_pair_runs(d_s, q_s, run_capacity)


def _fused_tail(text, qt, lo, width, sa_aug, m, k: int, capacity: int,
                run_capacity: int, backend: str, stride: int = 1,
                ext_r=None, kept_capacity: int | None = None,
                minlen: int = 0,
                split: tuple[int, int] | None = None, ext_q=None,
                elig_capacity: int | None = None):
    """Shared fused-query tail: expansion + run extraction, ONE int32 wire.

    backend "sort": kept-run triples (3 x kept_capacity) +
    [nz, n_kept, n_runs, total, max_w] (nz = samples with width >= 1, the
    split planner's exact residual input); backend "boundary": start/end
    events
    (4 x run_capacity) + [n_starts, n_ends, total, max_w]. The exact int64
    cum/summary stay device-resident for the overflow path. With stride > 1
    (sparse seeding, sort backend only) run cores are extended to exact
    boundaries in the same dispatch — the wire is already position-space.

    The min-length filter runs ON DEVICE (sort backend): only runs with
    k + qend - qstart >= minlen are compacted into the kept buffer, so the
    wire carries kept triples, not raw runs. Measured at chr21 scale the
    raw wire was 3 x 1M int32 = 12.6 MB (~0.25 s of a 0.73 s query over
    the tunnel) while only ~287K of 896K runs survive the filter —
    kept_capacity tracks last call's kept count (find_seed_matches) the
    same way run_capacity tracks raw runs. minlen=0 keeps every run
    (n_kept == n_runs), preserving the pre-filter wire semantics.

    Overflow contract: when n_kept > kept_capacity the scatter silently
    drops the excess (mode='drop') while the wire still reports the full
    n_kept — consumers MUST check n_kept <= kept_capacity before slicing
    and otherwise fall through to the multi-round path, mirroring the
    n_runs > run_capacity check. n_kept itself is exact only when
    n_runs <= run_capacity (the keep flags only see compacted slots).
    """
    # summary from sum/max REDUCES, not a scan: the int64 width cumsum is
    # consumed only by the overflow path's round planner, and XLA scans
    # are the slow primitive on v5e — the host computes it lazily (one
    # tiny extra dispatch) in the rare fallback instead of every call
    summary = jnp.stack([jnp.sum(width, dtype=jnp.int64),
                         jnp.max(width).astype(jnp.int64)])
    m_off = jnp.int32(m + 1)  # diag_mod = 2m + 2 convention
    i32max = jnp.int64(np.iinfo(np.int32).max)
    clipped = jnp.stack([jnp.minimum(summary[0], i32max).astype(jnp.int32),
                         jnp.minimum(summary[1], i32max).astype(jnp.int32)])
    if backend == "boundary":
        assert stride == 1, "boundary backend is dense-only"
        sd, sq, ed, eq, ns, ne, _np_ = _expand_flags_core(
            text, qt, sa_aug, lo, width, jnp.int32(0), m_off, k, capacity,
            run_capacity)
        packed = jnp.concatenate([sd, sq, ed, eq,
                                  jnp.stack([ns, ne]), clipped])
    else:
        if split is not None:
            resid_k, resid_cap = split
            d_s, q_s, split_ovf = _expand_pairs_split(
                sa_aug, lo, width, m_off, resid_k, resid_cap, stride)
        else:
            d_s, q_s = _expand_pairs_core(sa_aug, lo, width, jnp.int32(0),
                                          m_off, capacity, stride)
            split_ovf = None
        run_d, run_qs, run_qe, n_runs, _n_pairs = _compact_pair_runs(
            d_s, q_s, run_capacity)
        if split_ovf is not None:
            # discarded-result contract (_expand_pairs_split): an int32max
            # run count fails the host's n_runs <= run_capacity check, so
            # it falls through to the multi-round recompute from lo/width
            n_runs = jnp.where(split_ovf, _I32MAX, n_runs)
        kcap = run_capacity if kept_capacity is None else kept_capacity
        slot = jnp.arange(run_capacity, dtype=jnp.int32)
        # Pre-extension span bound (span_w_min): runs of fewer than
        # w_min windows can NEVER reach minlen. All quantities static.
        w_min = span_w_min(minlen, k, stride)
        if stride != 1 and w_min >= 2:
            # chr-scale shape (deep minlen): the n*m_s/4^K noise
            # collisions are single-window runs and dominate the raw run
            # buffer (~3.3M of ~3.7M at the chr1 config) — filter by the
            # span bound + compact into the ELIGIBLE buffer, run the
            # 4-gather extension there, then apply the exact final length
            # filter and compact into the (smaller) kept wire. Eligible
            # and kept counts differ (sub-minlen true runs are eligible),
            # so each buffer is adaptively sized on its own (plan_fused).
            ecap = kcap if elig_capacity is None else elig_capacity
            elig = (slot < n_runs) & (run_qe - run_qs + 1
                                      >= jnp.int32(w_min))
            eidx = jnp.cumsum(elig.astype(jnp.int32)) - 1
            n_elig = eidx[-1] + 1
            tgt_e = jnp.where(elig, eidx, jnp.int32(ecap))
            ed_ = jnp.full((ecap,), -1, jnp.int32).at[tgt_e].set(
                run_d, mode="drop")
            eqs0 = jnp.full((ecap,), -1, jnp.int32).at[tgt_e].set(
                run_qs, mode="drop")
            eqe0 = jnp.full((ecap,), -1, jnp.int32).at[tgt_e].set(
                run_qe, mode="drop")
            if ext_q is None:  # direct callers; the engine passes the
                ext_q = ext_arrays(qt)  # per-query cached tables instead
            eqs, eqe = _extend_core(
                ed_ - m_off, eqs0, eqe0, n_elig, ext_r, ext_q, stride, k)
            slot_e = jnp.arange(ecap, dtype=jnp.int32)
            length = eqe - eqs + jnp.int32(k)
            keep = (slot_e < n_elig) & (length >= jnp.int32(minlen))
            kidx = jnp.cumsum(keep.astype(jnp.int32)) - 1
            n_kept = kidx[-1] + 1
            tgt = jnp.where(keep, kidx, jnp.int32(kcap))
            kd = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                ed_, mode="drop")
            kqs = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                eqs, mode="drop")
            kqe = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                eqe, mode="drop")
        else:
            if stride != 1:
                # shallow minlen (w_min == 1): every run is span-eligible,
                # so extend in place and filter by the exact final length
                if ext_q is None:
                    ext_q = ext_arrays(qt)
                run_qs, run_qe = _extend_core(
                    run_d - m_off, run_qs, run_qe, n_runs, ext_r, ext_q,
                    stride, k)
            length = run_qe - run_qs + jnp.int32(k)
            keep = (slot < n_runs) & (length >= jnp.int32(minlen))
            kidx = jnp.cumsum(keep.astype(jnp.int32)) - 1
            n_kept = kidx[-1] + 1  # == sum(keep); run_capacity >= 1 always
            tgt = jnp.where(keep, kidx, jnp.int32(kcap))
            kd = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                run_d, mode="drop")
            kqs = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                run_qs, mode="drop")
            kqe = jnp.full((kcap,), -1, jnp.int32).at[tgt].set(
                run_qe, mode="drop")
            n_elig = n_kept   # no intermediate buffer on these shapes
        nz = jnp.sum(width >= 1, dtype=jnp.int32)  # split-planner input
        packed = jnp.concatenate([kd, kqs, kqe,
                                  jnp.stack([nz,
                                             n_elig.astype(jnp.int32),
                                             n_kept.astype(jnp.int32),
                                             n_runs.astype(jnp.int32)]),
                                  clipped])
    return lo, width, summary, packed


@functools.partial(jax.jit,
                   static_argnames=("k", "capacity", "run_capacity",
                                    "backend", "stride", "kept_capacity",
                                    "minlen", "split", "elig_capacity"))
def fused_query(text, refk, sa_aug, qt, k: int, capacity: int,
                run_capacity: int, backend: str = "sort", stride: int = 1,
                ext_r=None, kept_capacity: int | None = None,
                minlen: int = 0, split: tuple[int, int] | None = None,
                ext_q=None, elig_capacity: int | None = None):
    """Whole MEM query in ONE dispatch for the common single-round case.

    Packs K-mers, joins intervals, expands and extracts runs optimistically
    against the full capacity; the host fetches a few scalars and, when
    total pairs <= capacity and runs/boundaries fit run_capacity, only the
    run payload — two round trips for the entire query. On overflow the
    returned (lo, width, cum, summary) device arrays feed the planned
    multi-round path with no recomputation. stride > 1 = sparse seeding
    (sampled query rows into the join, inline endpoint extension);
    ext_q = the query_ext_table tables (computed inline if omitted —
    per-dispatch O(m) scans the engine avoids by passing them in).
    """
    qk_w, qvalid = sampled_query_keys(qt, k, stride)
    lo, width = _join_intervals(refk, qk_w, qvalid)
    return _fused_tail(text, qt, lo, width, sa_aug, qt.shape[0], k,
                       capacity, run_capacity, backend, stride, ext_r,
                       kept_capacity, minlen, split, ext_q, elig_capacity)


@functools.partial(jax.jit,
                   static_argnames=("k", "capacity", "run_capacity", "shift",
                                    "probes", "backend", "stride",
                                    "kept_capacity", "minlen", "split",
                                    "elig_capacity"))
def fused_query_bucket(text, refk, starts, sa_aug, qt, k: int,
                       capacity: int, run_capacity: int, shift: int,
                       probes: int, backend: str = "sort", stride: int = 1,
                       ext_r=None, kept_capacity: int | None = None,
                       minlen: int = 0, split: tuple[int, int] | None = None,
                       ext_q=None, elig_capacity: int | None = None):
    """fused_query with the bucket frontend — for references much larger
    than the query batch, where the join would re-sort n + m entries."""
    qk_w, qvalid = sampled_query_keys(qt, k, stride)
    lo, width = _bucket_intervals(refk, starts, qk_w, qvalid, shift, probes)
    return _fused_tail(text, qt, lo, width, sa_aug, qt.shape[0], k,
                       capacity, run_capacity, backend, stride, ext_r,
                       kept_capacity, minlen, split, ext_q, elig_capacity)


@functools.partial(jax.jit, static_argnames=("capacity", "block", "stride"))
def expand_block_pairs(sa_aug, lo_full, w_full, start, limit,
                       m_off, capacity: int, block: int, stride: int = 1):
    """Fixed-shape expansion returning sorted int32 (diag', qpos) pairs —
    the overflow / MUM/MAM path (per-pair data must reach the host).
    stride > 1: q column carries sample indices (sparse run overflow)."""
    lo, w, q_start = _block_slices(lo_full, w_full, start, limit, block)
    return _expand_pairs_core(sa_aug, lo, w, q_start, m_off, capacity,
                              stride)


# ---------------------------------------------------------------------------
# Run extraction (host side, vectorized numpy)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RunBatch:
    """Maximal >=K matches as diagonal runs."""

    diag: np.ndarray    # int64 refpos - qpos
    qstart: np.ndarray  # int64 first query position of the run
    qend: np.ndarray    # int64 last  query position of the run (inclusive)


def runs_from_sorted_pairs(d: np.ndarray, q: np.ndarray,
                           m_off: int) -> RunBatch:
    """Decode sorted int32 (diag', qpos) pairs into maximal runs."""
    sel = d != np.iinfo(np.int32).max
    d = d[sel].astype(np.int64) - m_off
    q = q[sel].astype(np.int64)
    if d.size == 0:
        e = np.zeros(0, np.int64)
        return RunBatch(e, e, e.copy())
    brk = np.empty(d.size, dtype=bool)
    brk[0] = True
    brk[1:] = (d[1:] != d[:-1]) | (q[1:] != q[:-1] + 1)
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], d.size)  # exclusive
    diag = d[starts]
    qstart = q[starts]
    qend = qstart + (ends - starts - 1)
    return RunBatch(diag, qstart, qend)


def runs_from_compacted32(run_d: np.ndarray, run_qs: np.ndarray,
                          run_qe: np.ndarray, n_runs: int,
                          m_off: int) -> RunBatch:
    """Decode device-compacted int32 run triples into a RunBatch."""
    return RunBatch((run_d[:n_runs].astype(np.int64) - m_off),
                    run_qs[:n_runs].astype(np.int64),
                    run_qe[:n_runs].astype(np.int64))


def _sort_diag_qstart(diag: np.ndarray, qstart: np.ndarray) -> np.ndarray:
    """Order by (diag, qstart): one stable argsort of a packed int64 key.

    2x faster than np.lexsort on random runs, more on multi-batch input
    (timsort exploits the per-batch sortedness). Both columns are
    non-negative and the shifted key fits int64 at any genome scale this
    engine addresses (diag < 2^35, qstart < 2^28); falls back to lexsort
    if a pathological input ever violates that.
    """
    if diag.size == 0:
        return np.empty(0, np.int64)
    dmin = int(diag.min())          # run diagonals are signed (biased by
    qmin = int(qstart.min())        # -m_off); bias both into [0, span)
    qspan = int(qstart.max()) - min(qmin, 0)
    dspan = int(diag.max()) - min(dmin, 0)
    shift = max(1, qspan.bit_length())
    if qmin < 0 or dspan.bit_length() + shift > 63:
        return np.lexsort((qstart, diag))  # pathological ranges only
    d64 = diag.astype(np.int64)
    if dmin < 0:
        d64 = d64 - np.int64(dmin)
    key = (d64 << np.int64(shift)) | qstart.astype(np.int64)
    return np.argsort(key, kind="stable")


def merge_runs(batches: list[RunBatch]) -> RunBatch:
    """Merge per-round runs whose spans abut across round boundaries.

    Rounds partition query positions into contiguous blocks, so a match
    crossing a block edge appears as two (or more) runs with the same
    diagonal and contiguous [qstart, qend] spans. Chains collapse with a
    groupby over break flags.
    """
    diag = np.concatenate([b.diag for b in batches])
    qstart = np.concatenate([b.qstart for b in batches])
    qend = np.concatenate([b.qend for b in batches])
    if diag.size == 0:
        return RunBatch(diag, qstart, qend)
    order = _sort_diag_qstart(diag, qstart)
    diag, qstart, qend = diag[order], qstart[order], qend[order]
    new = np.empty(diag.size, dtype=bool)
    new[0] = True
    new[1:] = (diag[1:] != diag[:-1]) | (qstart[1:] != qend[:-1] + 1)
    gstart = np.flatnonzero(new)
    gend = np.append(gstart[1:], diag.size) - 1
    return RunBatch(diag[gstart], qstart[gstart], qend[gend])


# ---------------------------------------------------------------------------
# Top-level search
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SeedMatches:
    """Matches in global text coordinates + pair tables for uniqueness."""

    refpos: np.ndarray   # int64
    qpos: np.ndarray     # int64
    length: np.ndarray   # int64
    stats: dict | None = None  # {'pairs', 'k', 'rounds', 'bytes_min'}


def roofline_bytes(n: int, m: int, k_words: int, pairs: int,
                   bucket: bool, stride: int = 1, probes: int = 12) -> int:
    """LOWER-BOUND HBM bytes of one seed query (the roofline denominator).

    Exact components: the frontend either sorts the n+m combined key rows
    (k_words+1 int32 columns, one read + one write pass is the floor) or
    bucket-probes refk (2 table gathers + 2 * probes * k_words refk gathers
    of 4 B per query position — probes is the table's REAL refinement
    count, 0 for a direct-addressed table); the boundary backend then
    gathers 4 B of sa_aug plus two ~1 B boundary characters per pair and
    streams the pair-wide flag cumsums (8 B read+write floor per pair). A
    sort makes several passes and gathers touch whole cache lines, so
    achieved time can exceed this floor — hbm_fraction computed from it is
    a conservative (never flattering) roofline estimate (SURVEY.md §5).
    Key packing reads all m query codes once (+ m bytes) regardless of
    stride — dense or sparse, every code byte feeds packed_key_words.
    """
    m_rows = -(-m // stride)
    if bucket:
        frontend = m_rows * (2 + 2 * probes * k_words) * 4
    else:
        frontend = (n + m_rows) * 4 * (k_words + 1) * 2
    expand = pairs * 4
    flags = pairs * 2
    compact = pairs * 8
    return int(frontend + m + expand + flags + compact)


def _plan_blocks(cum: np.ndarray, m: int, capacity: int,
                 position_block: int) -> list[tuple[int, int]]:
    """Slice [0, m) into blocks whose pair totals fit the round capacity."""
    blocks = []
    start = 0
    while start < m:
        end = int(np.searchsorted(cum, cum[start] + capacity, side="right")) - 1
        end = min(max(end, start + 1), m, start + position_block)
        if cum[end] - cum[start] > capacity:  # single position too wide
            raise NotImplementedError(
                f"query position {start} has interval width "
                f"{int(cum[start + 1] - cum[start])} > pair_capacity "
                f"{capacity}; raise pair_capacity for this input")
        blocks.append((start, end))
        start = end
    return blocks


def query_bucket(m: int) -> int:
    """Pad query lengths to buckets so jits compile once per bucket."""
    if m <= 1 << 16:
        p = 1 << 10
        while p < m:
            p <<= 1
        return p
    block = 1 << 16
    return -(-m // block) * block


def pad_query(query_text: np.ndarray) -> np.ndarray:
    """Pad with N codes: padded windows are invalid, so zero extra matches."""
    m = int(query_text.shape[0])
    m_p = query_bucket(m)
    if m_p == m:
        return np.asarray(query_text, np.uint8)
    return np.concatenate([np.asarray(query_text, np.uint8),
                           np.full(m_p - m, CODE_N, np.uint8)])


_query_device_cache = DevCache("query_device")

# re-exported for tests/white-box probes; implementation in utils/pack2.py
from slamem_tpu.utils.pack2 import (codes_to_device as _codes_to_device,  # noqa: E402,E501
                                    pack_codes_2bit as _pack_codes_2bit)


def query_to_device(query_text: np.ndarray) -> tuple[np.ndarray, jax.Array]:
    """(padded codes, device copy) for a query, memoized per array object.

    Identical repeated queries (a serving engine's dedup case, and every
    benchmark repeat) skip the host->device upload entirely. A FIRST upload
    — the dominant term of one-shot serving (VERDICT r4 missing #2: 0.51 s
    of chr21's ~0.95 s total was this wire) — ships a 2-bit plane
    (4 bp/byte) plus a sparse (index, value) side channel for N/SEP
    positions, and reconstitutes exact uint8 codes in one device program:
    a ~4x cut of the wire at ~1 byte/bp tunnels (utils/pack2.py).
    Special-dense queries (> 1/8 of positions; no real genome) fall back
    to the plain upload so the side channel can never exceed the plane it
    rides with. query_bucket padding never rides the wire either way —
    the device pads arithmetically from the real length.
    """
    key = id(query_text)
    hit = _query_device_cache.get(key, query_text)
    if hit is not None:
        return hit
    qp = pad_query(query_text)
    qt = _codes_to_device(qp, int(query_text.shape[0]))
    if qt is None:
        qt = jnp.asarray(qp)                  # special-dense: plain upload
    return _query_device_cache.put(key, query_text, (qp, qt))


def choose_seed_k(n: int, m: int, min_length: int, cap: int) -> int:
    """Seed depth K: min(L, cap), dropped to 16 when one word suffices.

    Random K-mer collisions contribute ~n*m/4^K candidate pairs; at
    bacterial scale (config #1) that is thousands at K=16 and the single
    uint32 word is cheaper (half the packing shifts, table bytes and sort
    columns). At chr scale it is 10^8..10^10 — the round-1 scaling wall —
    so the dual-word K <= 32 frontend takes over exactly when the noise
    would exceed a small fraction of a round's pair budget.
    """
    k = min(min_length, cap)
    if k <= 16:
        return k
    if float(n) * float(m) / float(4 ** 16) < (1 << 20):
        return 16
    return k


def choose_seed_k_sparse(n: int, m: int, min_length: int, cap: int) -> int:
    """Seed depth for the sparse-seeded MEM path (stride chosen from K).

    Two measured facts (scripts/tpu_experiments.py seedk_headline,
    re-swept in splitprof after the r3 frontend rewrite):
    * At short L the stride bound S <= L-K+1 makes K itself the sampling
      lever: with the r2 frontend K = L-6 (S = 7) was the knee; after the
      r3 carried-validity pack + paired direct-table gather, K = L-7
      (S = 8) wins (46.2 vs 44.0 Mbp/s at the 5 Mbp headline; S = 9
      regresses to 43.3) — fewer samples AND a 4x smaller direct table
      (256 MB at K = 13) keep paying until noise bites. Kept for L <= 22.
    * The collision term must count SAMPLED windows: noise ~ n*(m/S)/4^K.
      The dense estimate n*m/4^16 sent chr1-scale queries to dual-word
      K = 32 (30 bucket gathers per sample) when single-word K = 16 only
      produces ~180K sampled collisions — well within one round.
    Escalation to min(L, cap) (the dual-word frontend) happens exactly
    when single-word sampled noise would exceed ~1M pairs per query.

    K = 14 is additionally the deepest DIRECT-ADDRESSABLE seed (bucket_table:
    bbits = 2K, zero binary probes, 2 gathers per sample vs 2 + 2*probes).
    At L >= 23 it is preferred over K = 16 whenever its table gate passes
    (4^14 <= 64n) and its 16x-larger sampled noise stays within one
    adaptive-capacity round (~4M pairs): the frontend saves ~10 gathers per
    sample, the tail pays ~35 ms per extra million pair slots.
    """
    def noise(k: int) -> float:
        s = max(1, min(16, k, min_length - k + 1))
        return float(n) * (float(m) / s) / float(4 ** k)

    if min_length >= 23:
        k = min(min_length, 16, cap)
        if (cap >= 14 and (1 << 28) <= 64 * n and noise(14) < (4 << 20)):
            k = 14
    else:
        k = min(min_length, cap, max(8, min(min_length - 7, 16)))
    if noise(k) < (1 << 20) or (k == 14 and noise(k) < (4 << 20)):
        return k
    k16 = min(min_length, 16, cap)  # deepest single-word seed
    if noise(k16) < (1 << 20):
        return k16
    return min(min_length, cap)     # dual-word frontend


# Measured end-to-end frontend constants (scripts/tpu_experiments.py
# chr21sparse + prof2, v5e): the FULL join frontend costs ~10 ns per
# sorted row-column (raw sort is ~2 ns; concat, cumsum/cummax passes and
# the result scatters triple it), one 4-byte random gather ~16.6 ns. The
# model retro-predicts chr21 sparse (join 0.85 s vs bucket 0.50 s at
# probes=5) and chr1 replicated (join 7.6 s vs bucket 1.5 s) to ~5%.
_JOIN_NS_PER_ROW_COL = 10.0
_GATHER_NS = 16.6


def prefer_bucket(n: int, m_p: int, words: int = 1,
                  probes: int | None = None) -> bool:
    """True when the bucket frontend beats the sort join (measured model).

    The join re-sorts n + m_p rows of words+1 columns; the bucket search
    does 2 + 2*probes*words gathers per query position, independent of n.
    With probes from the real bucket table (log2 max bucket at bbits<=24,
    typically 3-7) the crossover sits near n ~ 6-10 * m_p — far below the
    round-1 n > 64*m_p guess, which assumed probes ~ 12 and charged the
    join only its raw sort. Callers that know the table pass (words,
    probes); the probeless form keeps the conservative default.
    """
    if probes is None:
        probes = 12
    join_ns = _JOIN_NS_PER_ROW_COL * float(n + m_p) * (words + 1)
    bucket_ns = _GATHER_NS * float(m_p) * (2 + 2 * probes * words)
    return bucket_ns < join_ns


@dataclasses.dataclass(frozen=True)
class FusedPlan:
    """Everything the fused fast path derives from the adaptive state.

    THE single planning authority: find_seed_matches executes it, the
    stage bench (bench.py --stages) reproduces dispatches from it, and
    convergence-warmup loops compare successive plans to know when the
    compiled shape family has stabilized (two equal consecutive plans =
    the next call dispatches already-compiled programs)."""

    k: int
    stride: int
    capacity: int
    run_cap: int
    kept_cap: int
    elig_cap: int
    split: tuple[int, int] | None
    skip_fused: bool
    use_bucket: bool
    m_p: int


def plan_fused(index: FMIndex, m_p: int, cfg: Config,
               query_text: np.ndarray | None = None) -> FusedPlan:
    """Buffer/frontend plan for one fused call, from the adaptive state.

    With query_text given (and an adaptive-eligible capacity) the plan
    first seeds the in-memory state from the persistent disk store, so a
    COLD process plans the snapped shape family on its first call — one
    compile family instead of three (VERDICT r3 #1).
    """
    k, stride, _sparse = choose_seed_plan(index.n, m_p, cfg)
    cap_cfg = int(cfg.pair_capacity)
    if query_text is not None and cap_cfg >= _GROWTH_MIN_CAPACITY:
        seed_last_from_disk(index, k, stride, m_p, query_text,
                            int(cfg.min_length))
    capacity = cap_cfg
    run_cap = max(4096, capacity // 16)
    last_pairs, last_runs, last_kept = _last_total(index, k, stride)
    if (last_pairs and cap_cfg >= _GROWTH_MIN_CAPACITY
            and last_runs is not None):
        # Track the observed workload: snap the pair and run buffers
        # INDEPENDENTLY to the smallest buckets holding last call's counts.
        # (A coupled run_cap = capacity//16 inflated the pair buffer 4x
        # whenever runs came dense — chr21 sparse measured pairs/runs ~ 6,
        # and every expansion op is capacity-wide.) Adapt only when both
        # were measured — resizing on pairs alone can shrink the run buffer
        # under the real run count, wasting a full dispatch before the
        # fallback. Deliberately small configured capacities keep their
        # semantics (same guard as the fallback growth below); stale
        # predictions are harmless (overflow falls through to the
        # multi-round path).
        capacity = capacity_bucket(
            last_pairs, 1 << 18, max(cap_cfg, int(cfg.pair_capacity_max)))
        run_cap = capacity_bucket(
            last_runs, 1 << 12,
            max(cap_cfg, int(cfg.pair_capacity_max)) // 8)
    # the wire carries only runs that survive the device-side min-length
    # filter; its buffer tracks last call's kept count (<= raw runs)
    kept_cap = run_cap
    if last_kept is not None:
        kept_cap = min(run_cap, capacity_bucket(last_kept, 1 << 12, run_cap))
    # deep-minlen shapes (span_w_min >= 2) route extension through a
    # span-ELIGIBLE intermediate buffer whose count exceeds the final kept
    # (sub-minlen true runs are eligible but filtered post-extension) —
    # sized independently so the wire stays at the kept count
    elig_cap = kept_cap
    if span_w_min(int(cfg.min_length), k, stride) >= 2:
        elig_cap = run_cap
        last_elig = _last_elig(index, k, stride)
        if last_elig is not None:
            elig_cap = min(run_cap,
                           capacity_bucket(last_elig, 1 << 12, run_cap))
    # split expansion (thin width distributions) replaces the capacity-wide
    # delta-fill skeleton with a direct first-pair gather + small residual
    # buffer. The residual pair mass is EXACT from last call's wire:
    # last_pairs - last_nonzero (each nonzero sample emits its first pair
    # directly). Gate: residual must fit a buffer <= capacity/2 or the
    # concat+sort grows past what the skeleton saved. Overflow (stale
    # prediction) falls back and blocks the key.
    m_s_plan = -(-m_p // stride)
    last_nz = _last_nonzero(index, k, stride)
    split = None
    if (cfg.match_backend == "sort" and last_pairs and last_nz is not None
            and (id(index.sa), k, stride) not in _split_blocklist):
        resid_est = max(0, last_pairs - last_nz)
        resid_floor = max(1024, min(1 << 16, capacity // 8))
        if 2 * resid_est <= max(resid_floor, capacity // 2):
            resid = capacity_bucket(max(2 * resid_est, resid_floor),
                                    resid_floor,
                                    max(resid_floor, capacity // 2))
            split = (min(resid, m_s_plan), resid)
    skip_fused = (last_pairs > capacity
                  or (last_runs is not None and last_runs > run_cap))
    m_s = m_p // stride
    use_bucket = cfg.frontend == "bucket"
    if cfg.frontend == "auto" and index.n >= 4 * m_s:
        # the model can only pick the bucket when n >~ 6*m_s, so the table
        # build (one cached pass over n) is skipped below that
        _, _, probes_auto = bucket_table(index, k)
        words = 2 if k > 16 else 1
        use_bucket = prefer_bucket(index.n, m_s, words, probes_auto)
    return FusedPlan(k=k, stride=stride, capacity=capacity, run_cap=run_cap,
                     kept_cap=kept_cap, elig_cap=elig_cap, split=split,
                     skip_fused=skip_fused, use_bucket=use_bucket, m_p=m_p)


def find_seed_matches(index: FMIndex, query_text: np.ndarray, cfg: Config,
                      mesh=None) -> SeedMatches:
    """All maximal matches of length >= cfg.min_length (mode filters later).

    Seed frontend: packed K-mer sorted search yields per-position intervals
    at depth K = choose_seed_k(...) <= min(L, seed_length_cap); the shared
    backend does the rest. The query is padded to a length bucket (N padding
    produces no windows) so every stage compiles once per bucket, not per
    query length.
    """
    qp, qt = query_to_device(query_text)
    m_p = int(qp.shape[0])
    plan = plan_fused(index, m_p, cfg, query_text)
    k, stride = plan.k, plan.stride
    capacity, run_cap, kept_cap = plan.capacity, plan.run_cap, plan.kept_cap
    split, use_bucket = plan.split, plan.use_bucket
    refk, sa_aug = seed_table(index, k)
    ext_r = ext_table(index) if stride != 1 else None
    if not plan.skip_fused and (mesh is None or len(mesh.devices.flat) == 1):
        # optimistic single-dispatch fast path (overflow falls through;
        # all modes — MUM/MAM filtering needs only the match set);
        # bucket frontend when the table dwarfs the query batch (the join
        # re-sorts n + m entries, the bucket search is O(m log maxbucket))
        backend = cfg.match_backend
        probes_used = 12
        minlen = int(cfg.min_length)
        ext_q = query_ext_table(qt) if stride != 1 else None
        if use_bucket:
            starts, shift, probes = bucket_table(index, k)
            probes_used = probes
            lo, width, summary, packed = fused_query_bucket(
                index.text, refk, starts, sa_aug, qt, k,
                capacity, run_cap, shift, probes, backend, stride, ext_r,
                kept_capacity=kept_cap, minlen=minlen, split=split,
                ext_q=ext_q, elig_capacity=plan.elig_cap)
        else:
            lo, width, summary, packed = fused_query(
                index.text, refk, sa_aug, qt, k, capacity,
                run_cap, backend, stride, ext_r,
                kept_capacity=kept_cap, minlen=minlen, split=split,
                ext_q=ext_q, elig_capacity=plan.elig_cap)
        wire = np.asarray(packed)  # the one round trip
        total, max_w = int(wire[-2]), int(wire[-1])

        def _fused_result(runs_obj):
            length = runs_obj.qend - runs_obj.qstart + k
            keep = length >= cfg.min_length
            return SeedMatches(
                refpos=(runs_obj.diag + runs_obj.qstart)[keep],
                qpos=runs_obj.qstart[keep], length=length[keep],
                stats={"pairs": total, "k": k, "rounds": 1,
                       "stride": stride, "split": split is not None,
                       "bytes_min": roofline_bytes(
                           index.n, m_p, len(refk), total,
                           bucket=use_bucket, stride=stride,
                           probes=probes_used)})

        fits = total <= min(capacity, np.iinfo(np.int32).max - 1)
        # run counts in the wire are exact only when the pair buffer held
        # the full expansion; a truncated round must not poison the
        # adaptive-capacity prediction
        if backend == "boundary":
            ns, ne = int(wire[-4]), int(wire[-3])
            _set_last_total(index, k, total, max(ns, ne) if fits else None,
                            stride)
            if fits and max(ns, ne) <= run_cap:
                bb = BoundaryBatch()
                bb.add(wire[:run_cap], wire[run_cap:2 * run_cap],
                       wire[2 * run_cap:3 * run_cap],
                       wire[3 * run_cap:4 * run_cap], ns, ne)
                return _fused_result(bb.runs(m_p + 1))
        else:
            nz = int(wire[-6])  # exact even on overflow (frontend widths)
            n_elig = int(wire[-5])
            n_kept, n_runs = int(wire[-4]), int(wire[-3])
            if split is not None and n_runs == np.iinfo(np.int32).max:
                # split-expansion overflow: the pair set may be incomplete
                # (discarded-result contract, _expand_pairs_split) — block
                # the key and recompute via the multi-round path; total
                # (from the frontend widths) is still exact
                _split_blocklist.add((id(index.sa), k, stride))
                _set_last_total(index, k, total, stride=stride, nonzero=nz)
                return pairs_to_matches(
                    index, lo, width, k, m_p, cfg, mesh, sa_aug,
                    cum=_lazy_cum(width),
                    summary=np.asarray(summary), qt=qt, stride=stride,
                    ext_r=ext_r,
                    frontend=(use_bucket, probes_used, len(refk)))
            # n_elig/n_kept count flags over compacted slots, so each is
            # exact only when every upstream buffer held its full set; a
            # truncated stage must not poison the downstream predictions
            runs_exact = fits and n_runs <= run_cap
            elig_exact = runs_exact and n_elig <= plan.elig_cap
            _set_last_total(index, k, total, n_runs if fits else None,
                            stride, kept=n_kept if elig_exact else None,
                            nonzero=nz,
                            elig=n_elig if runs_exact else None)
            if elig_exact and n_kept <= kept_cap:
                return _fused_result(runs_from_compacted32(
                    wire[:kept_cap], wire[kept_cap:2 * kept_cap],
                    wire[2 * kept_cap:3 * kept_cap], n_kept, m_p + 1))
        return pairs_to_matches(index, lo, width, k, m_p, cfg, mesh,
                                sa_aug, cum=_lazy_cum(width),
                                summary=np.asarray(summary), qt=qt,
                                stride=stride, ext_r=ext_r,
                                frontend=(use_bucket, probes_used,
                                          len(refk)))
    probes_used = 12
    if use_bucket:
        starts, shift, probes = bucket_table(index, k)
        probes_used = probes
        lo, width, cum, summary = query_frontend_bucket(
            refk, starts, qt, k, shift, probes, stride)
    else:
        lo, width, cum, summary = query_frontend(refk, qt, k, stride)
    summary_h = np.asarray(summary)
    _set_last_total(index, k, int(summary_h[0]), stride=stride)
    return pairs_to_matches(index, lo, width, k, m_p, cfg, mesh, sa_aug,
                            cum=cum, summary=summary_h, qt=qt,
                            stride=stride, ext_r=ext_r,
                            frontend=(use_bucket, probes_used, len(refk)))


def pairs_to_matches(index: FMIndex, lo: jax.Array, width: jax.Array, k: int,
                     m: int, cfg: Config, mesh=None,
                     sa_aug: jax.Array | None = None, cum=None,
                     summary=None, qt=None, stride: int = 1,
                     ext_r=None,
                     frontend: tuple[bool, int, int] | None = None
                     ) -> SeedMatches:
    """Shared backend: intervals at depth k -> maximal matches >= min_length.

    Host-side planning slices query positions into rounds whose total pair
    count fits cfg.pair_capacity; each round is one fixed-shape device
    dispatch. No silent caps: every interval is expanded across as many
    rounds as it needs. With a mesh, rounds dispatch ndev blocks at a time,
    data-parallel along the ``q`` axis with the index replicated
    (dist/seed.py). Works for any k <= min_length: runs of consecutive
    depth-k pairs on one diagonal ARE the maximal matches, and the final
    filter keeps lengths >= min_length.

    MEM mode extracts runs with the backend picked by Config.match_backend:
    "sort" (default) compacts device-sorted pairs into run triples,
    "boundary" ships character-flag start/end events (_expand_flags_core);
    MUM/MAM keep the sorted pair tables their occurrence counts need.
    """
    if sa_aug is None:
        sa_aug = index.sa  # all rows valid
    # (use_bucket, probes, k_words) of the frontend that PRODUCED lo/width —
    # the roofline stats must charge the bytes actually spent, not a guess
    # (a direct-addressed table is ~13x cheaper than the 12-probe default)
    if frontend is None:
        fr_bucket = prefer_bucket(index.n, m // max(stride, 1))
        fr_probes, fr_words = 12, (2 if k > 16 else 1)
    else:
        fr_bucket, fr_probes, fr_words = frontend
    capacity = int(cfg.pair_capacity)
    if (summary is not None and capacity >= _GROWTH_MIN_CAPACITY
            and int(summary[0]) > 3 * capacity):
        # many rounds ahead: amortize dispatch overhead with bigger buffers
        # (deliberately small capacities — tests, constrained configs — are
        # left alone)
        capacity = max(capacity, int(cfg.pair_capacity_max))
    # with sparse seeding (stride > 1) lo/width cover SAMPLE positions:
    # planning, blocks and run triples all live in sample space until the
    # post-merge endpoint extension (_finalize_strided)
    m_s = int(lo.shape[0])
    block = min(cfg.position_block, m_s)
    # qpos can reach (m_s - 1 + block) * stride; keep d = refpos - qpos +
    # diag_mod/2 sortable and collision-free per diagonal
    diag_mod = (np.int64(m + block + 2) if stride == 1
                else np.int64((m_s + block + 2) * stride + 2))

    if cum is None:
        w_host = np.asarray(width)
        cum_h = np.concatenate(([0], np.cumsum(w_host)))
        blocks = _plan_blocks(cum_h, m_s, capacity, block)
    else:
        blocks = plan_blocks_on_device(cum, summary, capacity, block, m_s)

    # pre-pad so in-program dynamic slices never clamp (start <= m)
    lo_ext = jnp.concatenate([lo, jnp.zeros((block,), lo.dtype)])
    w_ext = jnp.concatenate([width, jnp.zeros((block,), width.dtype)])

    use_boundary = (qt is not None and cfg.match_backend == "boundary"
                    and stride == 1)
    batches: list[RunBatch] = []

    run_cap = max(4096, capacity // 16)
    m_off32 = jnp.asarray(int(diag_mod) // 2, jnp.int32)
    m_off = int(diag_mod) // 2
    bb = BoundaryBatch()
    _host_codes: list = []

    def _fallback_host_flags(start, end) -> None:
        """Run-capacity overflow: raw pairs + exact host flags."""
        d_s, q_s = expand_block_pairs(
            sa_aug, lo_ext, w_ext, jnp.asarray(start, jnp.int64),
            jnp.asarray(end, jnp.int64), m_off32, capacity, block)
        if not _host_codes:
            _host_codes.append((np.asarray(index.text), np.asarray(qt)))
        rc, qc = _host_codes[0]
        bb.add_host_pairs(rc, qc, k, np.asarray(d_s), np.asarray(q_s),
                          m_off)

    def _mem_result(total_pairs: int, rounds: int) -> SeedMatches:
        runs = bb.runs(m_off)
        length = runs.qend - runs.qstart + k
        keep = length >= cfg.min_length
        # no device summary (scan-engine callers) means the pair count is
        # unknown — omit stats rather than report pairs=-1 and bytes built
        # from it (mirrors the sort tail's `if summary is not None` guard)
        stats = None
        if total_pairs >= 0:
            stats = {"pairs": total_pairs, "k": k, "rounds": rounds,
                     "bytes_min": roofline_bytes(
                         index.n, m, fr_words, total_pairs,
                         bucket=fr_bucket, probes=fr_probes)}
        return SeedMatches(
            refpos=(runs.diag + runs.qstart)[keep],
            qpos=runs.qstart[keep], length=length[keep], stats=stats)

    if mesh is None or len(mesh.devices.flat) == 1:
        if use_boundary:
            # dispatch ALL rounds before fetching anything: device work and
            # host transfers pipeline instead of paying one round trip per
            # round (round trips dominate on tunneled backends)
            pending = []
            for start, end in blocks:
                pending.append(expand_block_to_boundaries(
                    index.text, qt, sa_aug, lo_ext, w_ext,
                    jnp.asarray(start, jnp.int64),
                    jnp.asarray(end, jnp.int64),
                    m_off32, k, capacity, run_cap, block))
            sd_a = sq_a = ed_a = eq_a = ns_a = ne_a = None
            if pending:
                stacked = [jnp.stack([p[j] for p in pending])
                           for j in range(6)]
                sd_a, sq_a, ed_a, eq_a = (np.asarray(stacked[0]),
                                          np.asarray(stacked[1]),
                                          np.asarray(stacked[2]),
                                          np.asarray(stacked[3]))
                ns_a = np.asarray(stacked[4])
                ne_a = np.asarray(stacked[5])
            for r, (start, end) in enumerate(blocks):
                ns, ne = int(ns_a[r]), int(ne_a[r])
                if max(ns, ne) <= run_cap:
                    bb.add(sd_a[r], sq_a[r], ed_a[r], eq_a[r], ns, ne)
                else:
                    _fallback_host_flags(start, end)
            total_pairs = int(summary[0]) if summary is not None else -1
            if summary is not None and pending:
                # per-round counts are exact scalars even when a round's
                # arrays overflowed; their sum upper-bounds the single-
                # dispatch count (boundary-spanning runs count twice), so a
                # repeat call can size a fused buffer that will fit
                _set_last_total(index, k, total_pairs,
                                max(int(ns_a.sum()), int(ne_a.sum())))
            return _mem_result(total_pairs, len(blocks))
        else:
            # run-triple path (also the sparse multi-round path)
            pending = []
            for start, end in blocks:
                pending.append(expand_block_to_runs(
                    sa_aug, lo_ext, w_ext,
                    jnp.asarray(start, jnp.int64), jnp.asarray(end, jnp.int64),
                    m_off32, capacity, run_cap, block, stride))
            if pending:
                stacked = [jnp.stack([p[j] for p in pending])
                           for j in range(4)]
                run_d_all, run_qs_all, run_qe_all = (
                    np.asarray(stacked[0]), np.asarray(stacked[1]),
                    np.asarray(stacked[2]))
                n_runs_all = np.asarray(stacked[3])
            if summary is not None and pending:
                # same run-count upper bound as the boundary branch above
                _set_last_total(index, k, int(summary[0]),
                                int(n_runs_all.sum()), stride)
            for r, (start, end) in enumerate(blocks):
                n_runs = int(n_runs_all[r])
                if n_runs <= run_cap:
                    batches.append(runs_from_compacted32(
                        run_d_all[r], run_qs_all[r], run_qe_all[r], n_runs,
                        int(diag_mod) // 2))
                else:  # run-capacity overflow: fetch this block's pairs
                    d_s, q_s = expand_block_pairs(
                        sa_aug, lo_ext, w_ext,
                        jnp.asarray(start, jnp.int64),
                        jnp.asarray(end, jnp.int64), m_off32, capacity,
                        block, stride)
                    batches.append(runs_from_sorted_pairs(
                        np.asarray(d_s), np.asarray(q_s),
                        int(diag_mod) // 2))
    else:
        from slamem_tpu.dist.seed import (expand_boundaries_gathered,
                                          expand_runs_gathered)

        ndev = len(mesh.devices.flat)
        for g in range(0, len(blocks), ndev):
            group = blocks[g:g + ndev]
            # dummy blocks (start = limit = m) keep group shapes fixed
            starts = np.full(ndev, m, np.int64)
            limits = np.full(ndev, m, np.int64)
            for d, (st, en) in enumerate(group):
                starts[d] = st
                limits[d] = en
            if use_boundary:
                # boundary backend: per-device boundary flags, merged via
                # all_gather/psum collectives before emission — the host
                # matches start/end events, it never sorts pairs
                assert stride == 1  # use_boundary already implies this
                gsd, gsq, ged, geq, gns, gne, _tot = (
                    expand_boundaries_gathered(
                        mesh, index.text, qt, sa_aug, lo_ext, w_ext,
                        jnp.asarray(starts), jnp.asarray(limits),
                        m_off32, k, capacity, run_cap, block))
                gns_h = np.asarray(gns)
                gne_h = np.asarray(gne)
                gsd_h, gsq_h = np.asarray(gsd), np.asarray(gsq)
                ged_h, geq_h = np.asarray(ged), np.asarray(geq)
                for di, (st, en) in enumerate(group):
                    ns, ne = int(gns_h[di]), int(gne_h[di])
                    if max(ns, ne) <= run_cap:
                        bb.add(gsd_h[di], gsq_h[di], ged_h[di], geq_h[di],
                               ns, ne)
                    else:
                        _fallback_host_flags(st, en)
            else:
                # production path: on-device sort + run compaction,
                # triples merged via all_gather/psum collectives before
                # emission (BASELINE north star) — the host decodes runs
                gd, gqs, gqe, gnr, _tot = expand_runs_gathered(
                    mesh, sa_aug, lo_ext, w_ext,
                    jnp.asarray(starts), jnp.asarray(limits),
                    m_off32, capacity, run_cap, block, stride)
                gnr_h = np.asarray(gnr)
                gd_h, gqs_h, gqe_h = (np.asarray(gd), np.asarray(gqs),
                                      np.asarray(gqe))
                for di, (st, en) in enumerate(group):
                    nr = int(gnr_h[di])
                    if nr <= run_cap:
                        batches.append(runs_from_compacted32(
                            gd_h[di], gqs_h[di], gqe_h[di], nr,
                            int(diag_mod) // 2))
                    else:  # run overflow: fetch this block's raw pairs
                        d_s, q_s = expand_block_pairs(
                            sa_aug, lo_ext, w_ext,
                            jnp.asarray(st, jnp.int64),
                            jnp.asarray(en, jnp.int64), m_off32, capacity,
                            block, stride)
                        batches.append(runs_from_sorted_pairs(
                            np.asarray(d_s), np.asarray(q_s),
                            int(diag_mod) // 2))
        if use_boundary:
            return _mem_result(
                int(summary[0]) if summary is not None else -1, len(blocks))

    if stride != 1:
        matches = _finalize_strided(batches, qt, ext_r, k, stride, cfg)
    else:
        matches = finalize_matches(batches, k, cfg)
    if summary is not None:
        total_pairs = int(summary[0])
        matches.stats = {"pairs": total_pairs, "k": k,
                         "rounds": len(blocks), "stride": stride,
                         "bytes_min": roofline_bytes(
                             index.n, m, fr_words, total_pairs,
                             bucket=fr_bucket, stride=stride,
                             probes=fr_probes)}
    return matches


def _finalize_strided(batches: list[RunBatch], qt, ext_r, k: int,
                      stride: int, cfg: Config) -> SeedMatches:
    """Sparse multi-round tail: merge sample-space run fragments, then one
    endpoint-extension dispatch recovers exact position-space boundaries.

    Fragments are merged BEFORE extension — a match crossing a round edge
    splits into fragments whose interior boundaries are not flanked by
    mismatches, so extending fragments independently would over-extend.
    Upload cost is 3 int32 arrays of the merged RUN count (padded to a
    power-of-two bucket so the dispatch compiles once per bucket).
    """
    runs = merge_runs(batches) if batches else RunBatch(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
    # same pre-extension span bound as the fused path (span_w_min): the
    # provably-short runs (chr-scale noise collisions) never enter the
    # padded extension dispatch — a host boolean filter here
    w_min = span_w_min(int(cfg.min_length), k, stride)
    if w_min > 1:
        ok = (runs.qend - runs.qstart + 1) >= w_min
        runs = RunBatch(runs.diag[ok], runs.qstart[ok], runs.qend[ok])
    nr = int(runs.diag.size)
    if nr == 0:
        e = np.zeros(0, np.int64)
        return SeedMatches(refpos=e, qpos=e.copy(), length=e.copy())
    bucket = max(1024, 1 << (nr - 1).bit_length())
    pad = bucket - nr
    diag32 = np.concatenate([runs.diag, np.zeros(pad, np.int64)]
                            ).astype(np.int32)
    qs32 = np.concatenate([runs.qstart, np.zeros(pad, np.int64)]
                          ).astype(np.int32)
    qe32 = np.concatenate([runs.qend, np.zeros(pad, np.int64)]
                          ).astype(np.int32)
    ext_q = query_ext_table(qt)
    qstart_p, qend_p = extend_runs(
        jnp.asarray(diag32), jnp.asarray(qs32), jnp.asarray(qe32),
        jnp.int32(nr), ext_r, ext_q, stride, k)
    qstart = np.asarray(qstart_p)[:nr].astype(np.int64)
    qend = np.asarray(qend_p)[:nr].astype(np.int64)
    length = k + qend - qstart
    keep = length >= cfg.min_length
    return SeedMatches(refpos=(runs.diag + qstart)[keep],
                       qpos=qstart[keep], length=length[keep])


def finalize_matches(batches: list[RunBatch], k: int,
                     cfg: Config) -> SeedMatches:
    """Merge per-round/per-shard run fragments into final matches.
    Shared tail of the replicated and sharded paths. MUM/MAM occurrence
    uniqueness is decided later from the match set itself
    (apply_mode_filter) — no per-pair data survives the rounds."""
    runs = merge_runs(batches) if batches else RunBatch(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
    length = runs.qend - runs.qstart + k
    keep = length >= cfg.min_length
    return SeedMatches(
        refpos=(runs.diag + runs.qstart)[keep],
        qpos=runs.qstart[keep],
        length=length[keep],
    )


# ---------------------------------------------------------------------------
# MUM / MAM filtering (SURVEY.md §3.4)
# ---------------------------------------------------------------------------

def _unique_intervals(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    """keep[i] = no OTHER interval [start_j, end_j] contains interval i.

    Sort by (start asc, end desc): any container of i sorts before i and
    its end survives in the exclusive prefix max; exact duplicates contain
    each other, so the earlier twin (which the prefix max misses) is caught
    by the adjacent-duplicate test. O(N log N), fully vectorized.
    """
    n = start.size
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-end, start))
    s, e = start[order], end[order]
    contained = np.zeros(n, bool)
    contained[1:] = np.maximum.accumulate(e)[:-1] >= e[1:]
    contained[:-1] |= (s[:-1] == s[1:]) & (e[:-1] == e[1:])
    keep = np.empty(n, bool)
    keep[order] = ~contained
    return keep


def apply_mode_filter(matches: SeedMatches, cfg: Config) -> SeedMatches:
    """MEM: identity. MAM: ref-unique. MUM: ref-unique AND query-unique.

    Occurrence uniqueness is decided from the MATCH SET ALONE — no pair
    tables, no dense seeding (r2 VERDICT #6). Proof sketch (reference
    semantics: slaMEM's MUM/MAM uniqueness filters, SURVEY.md §3.4):

      * ref occurrences of m's string q[m.qpos : m.qpos+m.length] biject
        with maximal matches whose QUERY interval contains m's: an
        occurrence at ref position p extends maximally to a match with
        qstart <= m.qpos, qend >= m.qpos + m.length on diagonal p - m.qpos
        (distinct p -> distinct diagonal -> distinct match), and
        conversely such a match witnesses an occurrence at
        diag + m.qpos. So occ_ref(m) == 1 iff no OTHER match's query
        interval contains m's.
      * query occurrences of the same string biject with maximal matches
        whose REF interval [refpos, refpos+length) contains m's (same
        argument mirrored; distinct query position -> distinct diagonal).

    Every containing match has length >= m.length >= min_length, so the
    min-length-filtered match set the engines emit contains every
    candidate container — including under sparse seeding, whose coverage
    guarantee applies to all matches >= min_length (choose_stride).
    """
    if cfg.mode.value == "mem":
        return matches
    keep = _unique_intervals(matches.qpos, matches.qpos + matches.length)
    if cfg.mode.value == "mum":
        keep &= _unique_intervals(matches.refpos,
                                  matches.refpos + matches.length)
    return SeedMatches(matches.refpos[keep], matches.qpos[keep],
                       matches.length[keep], stats=matches.stats)
