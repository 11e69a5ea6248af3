"""Pallas TPU kernel for batched FM-index rank/occ queries.

occ(c, j) = count of char c in bwt[0:j) — the reference's per-character occ
lookup (bwtindex.c layer, SURVEY.md §2) re-designed for the TPU memory
system. The BWT is re-blocked into an INTERLEAVED table of 128-uint32 rows:

    row b = [ occ_A, occ_C, occ_G, occ_T at position b*496 |
              124 words x 4 bytes = 496 BWT symbols ]

so one rank query touches exactly ONE 512-byte lane-aligned row — counts and
symbols arrive in the same DMA (the textbook FM-index cache-block layout,
here shaped (rows, 128) so Mosaic's tiling accepts dynamic row DMAs; the
round-1 kernel used per-lane 1D DMAs, which Mosaic rejects with a 1024-tiling
alignment error). A tile of 128 queries per program pipelines 128 row copies
HBM->VMEM (all started before any wait), then one vectorized
compare/mask/popcount over the (128, 124) word tile plus a one-hot count add
produce the answers.

Memory traffic per query is exactly 512 B — "the rank-query inner loop at
speed-of-light HBM bandwidth per chip" (BASELINE north star) becomes
measurable: achieved GB/s = 512 * queries / seconds (see bench.py --rank).

The jnp reference implementation is index.build.rank_batch; equivalence is
tested in interpret mode on CPU and in compiled mode on the real chip
(tests/test_rank_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamem_tpu.index.build import FMIndex

TILE = 128          # queries per program
ROW_WORDS = 128     # uint32 words per interleaved row (512 B, lane-aligned)
CNT_WORDS = 4       # leading occ counter words
SYMS_PER_ROW = (ROW_WORDS - CNT_WORDS) * 4  # 496 BWT symbols per row

_rows_cache: dict[int, tuple] = {}


@jax.jit
def _build_rows(bwt: jax.Array) -> jax.Array:
    """Interleaved (rows, 128) uint32 occ/BWT table from a uint8 BWT."""
    n = bwt.shape[0]
    nrows = n // SYMS_PER_ROW + 1  # +1: position j == n stays in range
    pad = nrows * SYMS_PER_ROW - n
    # sentinel-pad (6): padding never counts toward any ACGT char
    sym = jnp.concatenate([bwt, jnp.full((pad,), 6, jnp.uint8)]).reshape(
        nrows, SYMS_PER_ROW)
    per_row = (sym[:, :, None] ==
               jnp.arange(4, dtype=jnp.uint8)[None, None, :]).sum(
                   axis=1, dtype=jnp.int32)
    prefix = jnp.cumsum(per_row, axis=0) - per_row  # counts before each row
    words = jax.lax.bitcast_convert_type(
        sym.reshape(nrows, ROW_WORDS - CNT_WORDS, 4), jnp.uint32)
    return jnp.concatenate([prefix.astype(jnp.uint32), words], axis=1)


def interleaved_rows(index: FMIndex) -> jax.Array:
    """Cached interleaved occ/BWT table for an index."""
    key = id(index.sa)
    hit = _rows_cache.get(key)
    if hit is not None and hit[0] is index.sa:
        return hit[1]
    rows = _build_rows(index.bwt)
    if len(_rows_cache) > 8:
        _rows_cache.clear()
    _rows_cache[key] = (index.sa, rows)
    return rows


GSIZE = 8  # sublane tiles per program: 8 x TILE = 1024 queries/program


def _rank_kernel(pos_smem, chars_vmem, pos_vmem, rows_hbm, out_ref,
                 blocks, sems):
    nq = GSIZE * TILE

    def get_copy(j):
        # explicit lax arithmetic, int32 loop bounds: the jnp operator path
        # trips a dtype promotion recursion when tracing SMEM scalar reads,
        # and a 64-bit loop counter forces an i64->i32 convert whose Mosaic
        # lowering rule recurses — both are avoided, not worked around
        g = jax.lax.div(j, jnp.int32(TILE))
        i = jax.lax.rem(j, jnp.int32(TILE))
        blk = jax.lax.div(pos_smem[g, i], jnp.int32(SYMS_PER_ROW))
        # TILE semaphore slots shared across the GSIZE groups: the sflag
        # space holds ~512 slots total, and correctness only needs "all
        # copies landed before any read" — the full wait loop drains exactly
        # the bytes the full start loop signals, per slot
        return pltpu.make_async_copy(rows_hbm.at[blk], blocks.at[j],
                                     sems.at[i])

    def start(j, _):
        get_copy(j).start()
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nq), start, jnp.int32(0))

    def wait(j, _):
        get_copy(j).wait()
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nq), wait, jnp.int32(0))

    for g in range(GSIZE):                       # static unroll
        chars = chars_vmem[g, :]                 # (TILE,) uint32
        within = jax.lax.rem(pos_vmem[g, :], jnp.int32(SYMS_PER_ROW))
        block = blocks[g * TILE:(g + 1) * TILE, :]   # (TILE, ROW_WORDS)
        lane_u = jax.lax.broadcasted_iota(jnp.uint32, (TILE, ROW_WORDS), 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, ROW_WORDS), 1)
        # ALL ops run full 128-lane width: narrow lane slices (e.g. the
        # first-4-words counter view) hang Mosaic's compile, and
        # unsigned->signed vector converts recurse — so the counter pick is
        # a full-width lane==char select over a full-width bitcast, and the
        # symbol lanes are masked by lane index instead of sliced away.
        full_i32 = jax.lax.bitcast_convert_type(block, jnp.int32)
        base_sel = lane_u == chars[:, None]      # true only at lanes 0..3
        zeros = jnp.zeros((TILE, ROW_WORDS), jnp.int32)
        base = jnp.sum(jnp.where(base_sel, full_i32, zeros), axis=1,
                       dtype=jnp.int32)
        # symbols arrive as little-endian uint32 words (4 per word): unpack
        # with integer shifts and compare in uint32 throughout
        hits = jnp.zeros((TILE,), jnp.int32)
        ones = jnp.ones((TILE, ROW_WORDS), jnp.int32)
        for byte in range(4):
            sub = (block >> (8 * byte)) & jnp.uint32(0xFF)
            sym_pos = (lane_i - jnp.int32(CNT_WORDS)) * 4 + byte
            hit = ((sub == chars[:, None]) &
                   (lane_i >= jnp.int32(CNT_WORDS)) &
                   (sym_pos < within[:, None]))
            hits = hits + jnp.sum(jnp.where(hit, ones, zeros), axis=1,
                                  dtype=jnp.int32)
        out_ref[g, :] = base + hits


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_rows_padded(rows: jax.Array, chars: jax.Array,
                     positions: jax.Array, interpret: bool = False
                     ) -> jax.Array:
    """Batched occ over the interleaved table; batch a GSIZE*TILE multiple.

    chars/positions arrive (nprog*GSIZE, TILE): 1D operands get an XLA
    layout tiling of 1024 that Mosaic's 128-lane expectation rejects, and
    block sublane counts must divide by 8 — so the batch folds into
    (GSIZE, TILE) blocks of 1024 queries per program.
    """
    grid = (chars.shape[0] // GSIZE,)
    return pl.pallas_call(
        _rank_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((GSIZE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GSIZE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GSIZE, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # rows stay in HBM
        ],
        out_specs=pl.BlockSpec((GSIZE, TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chars.shape[0], TILE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((GSIZE * TILE, ROW_WORDS), jnp.uint32),
            pltpu.SemaphoreType.DMA((TILE,)),
        ],
        interpret=interpret,
    )(positions, chars, positions, rows)


def rank_pallas(index: FMIndex, chars: jax.Array, positions: jax.Array,
                interpret: bool = False) -> jax.Array:
    """occ(c, j) batched — Pallas fast path, drop-in for rank_batch."""
    rows = interleaved_rows(index)
    b = int(chars.shape[0])
    bp = -(-b // (GSIZE * TILE)) * (GSIZE * TILE)
    cpad = jnp.concatenate(
        [chars.astype(jnp.uint32), jnp.zeros((bp - b,), jnp.uint32)]
    ).reshape(-1, TILE)
    ppad = jnp.concatenate(
        [positions.astype(jnp.int32), jnp.zeros((bp - b,), jnp.int32)]
    ).reshape(-1, TILE)
    out = rank_rows_padded(rows, cpad, ppad, interpret=interpret)
    return out.reshape(-1)[:b]
