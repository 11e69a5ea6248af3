"""FM-index construction as a JAX sort/scan pipeline.

Capability parity with the reference's ``bwtindex.c`` (SURVEY.md §2): suffix
array, BWT, cumulative char counts C[], sampled occ/rank checkpoints. The
construction is re-designed for TPU (SURVEY.md §3.1 "new system"):

  * suffix sorting is Manber–Myers prefix doubling — O(log n) rounds of
    ``jnp.argsort`` over packed (rank, rank@+k) int64 keys, a radix-sort
    friendly formulation, instead of the reference's sequential in-place
    construction;
  * BWT is one gather; occ checkpoints are one reshape + cumsum;
  * the index keeps the FULL suffix array resident in HBM (int32, n*4 bytes)
    instead of the reference's sampled SA + LF-walk locate: on a 16 GB-HBM
    chip the memory frugality of 2014-era CPUs is the wrong trade — a direct
    gather replaces a sequential pointer chase.

Alphabet / sort-order contract (shared with engines and io/fasta.py):
codes A=0 C=1 G=2 T=3, N=4, SEP=5. Every N/SEP position receives a UNIQUE
sort rank strictly below all A ranks (rank = its own position index), so no
two suffixes ever compare equal across an N or a sequence boundary — this is
what enforces "matches never span N / boundaries" (SURVEY.md §7) at the index
level. Suffix order is therefore: (specials, by position) < A < C < G < T,
and a shorter suffix that prefixes a longer one sorts first.
"""

from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from slamem_tpu.io.fasta import CODE_N

BWT_SENTINEL = 6  # bwt "char" for the row whose suffix starts at position 0

# id(index.sa) -> (weakref(sa), content digest). Side table instead of an
# FMIndex field: FMIndex is a registered pytree and aux data participates in
# jit cache keys — a per-content digest there would recompile every program
# per reference. The weakref guard handles id() reuse after GC.
_digest_map: dict[int, tuple] = {}


def register_digest(index: "FMIndex", digest: str) -> None:
    if len(_digest_map) > 64:
        _digest_map.clear()
    _digest_map[id(index.sa)] = (weakref.ref(index.sa), digest)


def index_digest(index: "FMIndex") -> str:
    """Content digest of the index's text (for the adaptive disk store).

    Registered at build/load time; the fallback fetches the text to host
    once (only hand-constructed FMIndex objects hit it)."""
    hit = _digest_map.get(id(index.sa))
    if hit is not None and hit[0]() is index.sa:
        return hit[1]
    from slamem_tpu.engine.adaptive import text_digest

    # hash WITHOUT the appended CODE_SEP terminator: build_index/load_index
    # register the digest of the pre-terminator text, and all three paths
    # must key the same adaptive-disk records (ADVICE r4)
    digest = text_digest(np.asarray(index.text)[:-1])
    register_digest(index, digest)
    return digest


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FMIndex:
    """Immutable FM-index over a (separator-joined) reference text.

    Array fields are jax Arrays so the whole index is a pytree that can be
    device_put / replicated / sharded by ``dist/``.
    """

    text: jax.Array       # (n,) uint8 codes 0..5
    sa: jax.Array         # (n,) int32 suffix array
    bwt: jax.Array        # (n,) uint8: text[sa-1], BWT_SENTINEL at sa==0
    occ_ckpt: jax.Array   # (n_blocks+1, 4) int32: per-char counts in bwt[:b*B]
    counts: jax.Array     # (4,) int32: C[c] = #suffixes starting with sym < c
    occ_block: int        # checkpoint spacing B

    @property
    def n(self) -> int:
        return int(self.text.shape[0])

    def tree_flatten(self):
        return ((self.text, self.sa, self.bwt, self.occ_ckpt, self.counts),
                self.occ_block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, occ_block=aux)


def initial_ranks(text: jax.Array) -> jax.Array:
    """Round-0 suffix ranks: unique-per-position for specials, below ACGT.

    int32 throughout (n < 2^31); only the packed sort key is int64. Narrow
    ranks halve both HBM footprint and the VMEM scan buffers of the rank
    densification cumsum (the 5M+ build blew the 16M scoped-vmem limit with
    64-bit scans).
    """
    n = text.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    return jnp.where(text >= CODE_N, pos, n + text.astype(jnp.int32))


def _round_body(rank: jax.Array, k: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One prefix-doubling round: ranks by 2k chars from ranks by k chars.

    Sorts (rank, rank@+k) lexicographically with one variadic int32
    lax.sort — 64-bit packed keys cost ~20x on v5e's sort path (measured).

    Two round-5 rewrites, each replacing a ~16 ns/element random-access op
    with sequential passes (scripts/build_budget.py: rounds were 10.4 s at
    250 Mbp, ~8 s of it these two ops):
      * rank@+k is a SHIFT, not a gather: slice [k, k+n) out of rank
        padded with n sentinel -1s — positions past the end come out -1
        (suffix shorter than k sorts smallest) with no mask, and
        dynamic_slice takes the traced k with a static size;
      * position-ordering the new ranks uses a 1-key sort by the carried
        index instead of a scatter — a bitonic pass beats random scatter
        ~2x at this width.
    """
    n = rank.shape[0]
    padded = jnp.concatenate([rank, jnp.full((n,), -1, jnp.int32)])
    rank_k = jax.lax.dynamic_slice(padded, (jnp.asarray(k, jnp.int32),),
                                   (n,))
    idx = jnp.arange(n, dtype=jnp.int32)
    r1, r2, order = jax.lax.sort((rank, rank_k, idx), dimension=0, num_keys=2)
    is_new = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32)])
    new_rank_sorted = jnp.cumsum(is_new)
    _, new_rank = jax.lax.sort((order, new_rank_sorted), dimension=0,
                               num_keys=1)
    return new_rank, new_rank_sorted[-1]


@jax.jit
def _doubling_round(rank: jax.Array, k: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Single jitted round — kept for LCP construction (index/lcp.py)."""
    return _round_body(rank, k)


@jax.jit
def _doubling_all(rank: jax.Array) -> jax.Array:
    """All doubling rounds in ONE device program (lax.while_loop).

    A host-synced loop costs one device<->host round trip per round, which
    dominates build time on tunneled/remote TPU backends (seconds per trip);
    on-device control flow makes the whole SA build a single dispatch.
    """
    n = rank.shape[0]

    def cond(carry):
        return jnp.logical_not(carry[2])

    def body(carry):
        rank, k, _ = carry
        new_rank, max_rank = _round_body(rank, k)
        done = (max_rank == n - 1) | (k >= n)
        return new_rank, k * 2, done

    rank, _, _ = jax.lax.while_loop(
        cond, body, (rank, jnp.int32(1), jnp.bool_(n <= 1)))
    return rank


def _padded_size(n: int) -> int:
    """Bucket sizes so the doubling round compiles once per bucket, not per n."""
    if n <= 1 << 20:
        p = 64
        while p < n:
            p <<= 1
        return p
    block = 1 << 20
    return -(-n // block) * block


def suffix_array(text: jax.Array) -> jax.Array:
    """Suffix array by prefix doubling (host loop, jitted rounds).

    The host loop runs at most ceil(log2 n) rounds and early-exits the moment
    ranks are dense (all distinct) — one scalar device->host sync per round.

    The text is padded to a bucketed size with extra trailing separators
    (each a unique special ranked by position, all after the real text), which
    leaves the relative order of real suffixes untouched: any two real
    suffixes diverge at or before the terminator build_index appended, whose
    rank does not depend on padding. Ranks are sliced back to the real length
    before the final argsort.
    """
    n = int(text.shape[0])
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    if n == 1:
        return jnp.zeros((1,), jnp.int32)
    np_ = _padded_size(n)
    padded = jnp.concatenate(
        [text, jnp.full((np_ - n,), 5, jnp.uint8)]) if np_ > n else text
    rank = _doubling_all(initial_ranks(padded))
    return jnp.argsort(rank[:n]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("occ_block",))
def _finish_index(text: jax.Array, sa: jax.Array, occ_block: int):
    """BWT, occ checkpoints and C[] from (text, sa)."""
    n = text.shape[0]
    prev = jnp.where(sa == 0, jnp.int32(0), sa - 1)
    bwt = jnp.where(sa == 0, jnp.uint8(BWT_SENTINEL), text[prev])

    n_blocks = -(-n // occ_block)
    pad = n_blocks * occ_block - n
    # sentinel-pad so padding never counts toward any ACGT char
    bwt_p = jnp.concatenate(
        [bwt, jnp.full((pad,), BWT_SENTINEL, jnp.uint8)]).reshape(
            n_blocks, occ_block)
    per_block = (bwt_p[:, :, None] ==
                 jnp.arange(4, dtype=jnp.uint8)[None, None, :]).sum(
                     axis=1, dtype=jnp.int32)
    occ_ckpt = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), jnp.cumsum(per_block, axis=0)])

    char_counts = (text[:, None] ==
                   jnp.arange(4, dtype=jnp.uint8)[None, :]).sum(
                       axis=0, dtype=jnp.int32)
    n_special = jnp.int32(n) - char_counts.sum()
    counts = n_special + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(char_counts)[:3]])
    return bwt, occ_ckpt, counts


def build_index(text: np.ndarray | jax.Array, occ_block: int = 128) -> FMIndex:
    """Build the full FM-index on device from a code array (SURVEY.md §3.1).

    A trailing CODE_SEP terminator is appended internally (FMIndex.text and
    FMIndex.n include it): without it, suffixes that run off the text end are
    reachable by no LF step and backward search undercounts matches touching
    the last position. The terminator is a special with the largest position
    index, so it sorts after all other specials and below every base —
    uniqueness is all the identity needs.
    """
    from slamem_tpu.engine.adaptive import text_digest

    digest = text_digest(text)  # host-side, before the device transfer
    dev_text = None
    if isinstance(text, np.ndarray) and text.size >= (1 << 20):
        # chr-scale reference upload rides the 2-bit packed wire
        # (utils/pack2.py): 4 bp/byte + sparse special side channel cuts
        # the dominant host->device term of a cold build ~4x on tunneled
        # backends (~3.2 s -> ~0.8 s at 250 Mbp; scripts/build_budget.py)
        from slamem_tpu.utils.pack2 import codes_to_device

        n = int(text.size)
        plane = text if n % 4 == 0 else np.concatenate(
            [text, np.zeros(4 - n % 4, np.uint8)])
        unpacked = codes_to_device(np.asarray(plane, np.uint8), n)
        if unpacked is not None:
            dev_text = jnp.concatenate(
                [unpacked[:n], jnp.full((1,), 5, jnp.uint8)])
    if dev_text is None:
        dev_text = jnp.concatenate(
            [jnp.asarray(text, dtype=jnp.uint8),
             jnp.full((1,), 5, jnp.uint8)])  # CODE_SEP terminator
    text = dev_text
    sa = suffix_array(text)
    bwt, occ_ckpt, counts = _finish_index(text, sa, occ_block)
    index = FMIndex(text=text, sa=sa, bwt=bwt, occ_ckpt=occ_ckpt,
                    counts=counts, occ_block=occ_block)
    register_digest(index, digest)
    return index


def rank_batch(index: FMIndex, chars: jax.Array, positions: jax.Array
               ) -> jax.Array:
    """occ(c, j): count of char c in bwt[0:j), batched (jnp reference impl).

    The Pallas fast path lives in kernels/rank.py; this version is the
    correctness oracle for it and the default on CPU. Memory pattern matches
    the design roofline: one checkpoint row + one B-byte block per query.
    """
    B = index.occ_block
    block = positions // B
    within = positions - block * B
    base = index.occ_ckpt[block, chars]
    rows = index.bwt[(block[:, None] * B +
                      jnp.arange(B, dtype=positions.dtype)[None, :])
                     .clip(max=index.n - 1)]
    in_block = ((rows == chars[:, None].astype(jnp.uint8)) &
                (jnp.arange(B, dtype=positions.dtype)[None, :] <
                 within[:, None])).sum(axis=1, dtype=jnp.int32)
    return base + in_block


def backward_step(index: FMIndex, c: jax.Array, lo: jax.Array, hi: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """One batched FM backward-extension step: interval of c+pattern.

    (lo, hi) are SA-interval bounds [lo, hi); c int32 codes in 0..3.
    """
    both = jnp.concatenate([lo, hi])
    cc = jnp.concatenate([c, c])
    occ = rank_batch(index, cc, both)
    k = lo.shape[0]
    cbase = index.counts[c]
    return cbase + occ[:k], cbase + occ[k:]
