"""Pallas TPU kernel for batched FM-index rank/occ queries.

occ(c, j) = count of char c in bwt[0:j) — the reference's per-character
occ lookup (bwtindex.c layer, SURVEY.md §2) re-shaped for TPU: a tile of 128
queries per program, per-lane async DMAs stream each query's 128-byte BWT
block HBM→VMEM (pipelined: all copies start before any wait), then one
vectorized compare/mask/popcount over the (128, 128) tile plus a one-hot
checkpoint add produce the answers. Memory traffic per query is exactly one
checkpoint row (16 B) + one block (128 B) — the design roofline of
BASELINE's "rank-query inner loop".

The jnp reference implementation is index.build.rank_batch; equivalence is
tested in interpret mode on CPU.

KNOWN LIMITATION (this sandbox's jax 0.9 / Mosaic): compiled-mode lowering
rejects per-lane dynamic DMAs from 1D arrays ("slice shape along dimension 0
must be aligned to tiling (1024)"), so the compiled path is currently gated
off; the scan engine uses the XLA rank_batch, which fuses the same
gather+compare+reduce. Revisit when Mosaic grows unaligned 1D DMA or by
re-blocking the BWT into lane-aligned 2D rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slamem_tpu.index.build import FMIndex

TILE = 128


def _rank_kernel(pos_smem, chars_vmem, pos_vmem, bwt_hbm, ckpt_hbm, out_ref,
                 blocks, ckrows, sems, csems, *, occ_block: int):
    words_per_block = occ_block // 4

    def _blk(i):
        # explicit lax arithmetic: the jnp operator path trips a dtype
        # promotion recursion when tracing SMEM scalar reads on this backend
        return jax.lax.div(pos_smem[i], jnp.int32(occ_block))

    def get_block_copy(i):
        blk = _blk(i)
        return pltpu.make_async_copy(
            bwt_hbm.at[pl.ds(jax.lax.mul(blk, jnp.int32(words_per_block)),
                             words_per_block)],
            blocks.at[i], sems.at[i])

    def get_ckpt_copy(i):
        return pltpu.make_async_copy(ckpt_hbm.at[_blk(i)], ckrows.at[i],
                                     csems.at[i])

    def start(i, _):
        get_block_copy(i).start()
        get_ckpt_copy(i).start()
        return 0

    jax.lax.fori_loop(0, TILE, start, 0)

    def wait(i, _):
        get_block_copy(i).wait()
        get_ckpt_copy(i).wait()
        return 0

    jax.lax.fori_loop(0, TILE, wait, 0)

    chars = chars_vmem[:]                       # (TILE,) uint32
    within = jax.lax.rem(pos_vmem[:], jnp.int32(occ_block))
    # The BWT arrives as little-endian uint32 words (4 symbols per word,
    # packed outside the kernel): unpack with integer shifts and compare in
    # uint32 throughout — Mosaic's unsigned<->signed vector converts recurse.
    words = blocks[:]                           # (TILE, occ_block // 4)
    hits = jnp.zeros((TILE,), jnp.int32)
    for byte in range(4):
        sub = (words >> (8 * byte)) & jnp.uint32(0xFF)
        lane_b = (jax.lax.broadcasted_iota(
            jnp.int32, (TILE, words_per_block), 1) * 4 + byte)
        hit = (sub == chars[:, None]) & (lane_b < within[:, None])
        one = jnp.ones((TILE, words_per_block), jnp.int32)
        zero = jnp.zeros((TILE, words_per_block), jnp.int32)
        hits = hits + jnp.sum(jnp.where(hit, one, zero), axis=1,
                              dtype=jnp.int32)
    onehot = (jax.lax.broadcasted_iota(jnp.uint32, (TILE, 4), 1)
              == chars[:, None])
    base = jnp.sum(jnp.where(onehot, ckrows[:],
                             jnp.zeros((TILE, 4), jnp.int32)),
                   axis=1, dtype=jnp.int32)
    out_ref[:] = base + hits


@functools.partial(jax.jit,
                   static_argnames=("occ_block", "interpret"))
def rank_pallas_padded(bwt_words: jax.Array, occ_ckpt: jax.Array,
                       chars: jax.Array, positions: jax.Array,
                       occ_block: int, interpret: bool = False) -> jax.Array:
    """Batched occ; bwt_words = uint32-packed padded BWT, batch a TILE
    multiple."""
    b = chars.shape[0]
    grid = (b // TILE,)
    kernel = functools.partial(_rank_kernel, occ_block=occ_block)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            # HBM pinned: ANY lets the compiler pull the checkpoint table
            # into VMEM, where dynamic row slices hit 1024-tiling alignment
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b,), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TILE, occ_block // 4), jnp.uint32),
            pltpu.VMEM((TILE, 4), jnp.int32),
            pltpu.SemaphoreType.DMA((TILE,)),
            pltpu.SemaphoreType.DMA((TILE,)),
        ],
        interpret=interpret,
    )(positions, chars, positions, bwt_words, occ_ckpt)


def rank_pallas(index: FMIndex, chars: jax.Array, positions: jax.Array,
                interpret: bool = False) -> jax.Array:
    """occ(c, j) batched — Pallas fast path, drop-in for rank_batch."""
    B = index.occ_block
    n_blocks = index.occ_ckpt.shape[0]  # nb + 1
    padded_len = n_blocks * B
    bwt_padded = jnp.concatenate(
        [index.bwt, jnp.full((padded_len - index.n,), 6, jnp.uint8)])
    bwt_words = jax.lax.bitcast_convert_type(
        bwt_padded.reshape(-1, 4), jnp.uint32)
    b = int(chars.shape[0])
    bp = -(-b // TILE) * TILE
    cpad = jnp.concatenate(
        [chars.astype(jnp.uint32), jnp.zeros((bp - b,), jnp.uint32)])
    ppad = jnp.concatenate(
        [positions.astype(jnp.int32), jnp.zeros((bp - b,), jnp.int32)])
    out = rank_pallas_padded(bwt_words, index.occ_ckpt, cpad, ppad, B,
                             interpret=interpret)
    return out[:b]
