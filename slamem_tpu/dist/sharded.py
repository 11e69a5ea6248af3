"""SA-rank-range index sharding (BASELINE config #5; SURVEY.md §5).

For references too large to replicate, the SA-ordered index tables — packed
K-mer table, SA values and row validity — split into contiguous SA-rank
slabs, one per device. The idiomatic mapping of "scale the long axis across
devices" for this workload (SURVEY.md §5 "Long-context / sequence
parallelism"):

  * refk is globally sorted, so a contiguous slab is itself sorted and a
    LOCAL sorted search returns exactly the intersection of any K-mer's
    global SA interval with the slab — shards need no rank exchange at all
    for seeding (unlike an occ-table split, which would all-to-all every
    rank query);
  * each shard expands only the interval parts it owns: candidate pairs are
    partitioned across shards with no duplicates by construction;
  * per-shard sorted key blocks are gathered and merged on the host, where
    diagonal runs (and thus matches) crossing slab boundaries reassemble —
    the same merge logic that already joins rounds (merge_runs).

Per-shard memory: O(n / ndev) for the slab tables; the query stream is
replicated (it is the small side at chr1 scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slamem_tpu.config import Config
from slamem_tpu.engine import seed_mode
from slamem_tpu.engine.seed_mode import (
    RunBatch, SeedMatches, merge_runs, packed_kmers, seed_table)
from slamem_tpu.index.build import FMIndex

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def shard_tables(index: FMIndex, k: int, mesh: Mesh):
    """Pad + split (refk, sign-augmented SA) into per-device SA-rank slabs."""
    ndev = len(mesh.devices.flat)
    refk, sa_aug = seed_table(index, k)
    n = index.n
    slab = -(-n // ndev)
    pad = slab * ndev - n
    # dtype-max padding sorts after every real row; padded rows carry the
    # sign-bit invalid flag so expansion drops them. Matching dtype matters:
    # an int64 pad would silently promote the whole uint32 table.
    pad_val = jnp.iinfo(refk.dtype).max
    refk_p = jnp.concatenate([refk, jnp.full((pad,), pad_val, refk.dtype)])
    sa_p = jnp.concatenate(
        [sa_aug, jnp.full((pad,), np.int32(-0x80000000), jnp.int32)])
    sh = NamedSharding(mesh, P("q", None))
    return (jax.device_put(refk_p.reshape(ndev, slab), sh),
            jax.device_put(sa_p.reshape(ndev, slab), sh))


@functools.partial(jax.jit, static_argnames=("mesh", "k"))
def sharded_frontend(mesh: Mesh, refk_sh: jax.Array, qt: jax.Array, k: int):
    """Per-shard local intervals for every query position.

    Returns (lo_local [ndev, m], width_local [ndev, m], width_max [m]):
    a K-mer's global interval is the disjoint union of the local ones.
    """

    def step(refk_l, qt):
        qk, qvalid = packed_kmers(qt, k)
        lo = jnp.searchsorted(refk_l[0], qk, side="left")
        hi = jnp.searchsorted(refk_l[0], qk, side="right")
        w = jnp.where(qvalid, hi - lo, 0).astype(jnp.int64)
        wmax = jax.lax.pmax(w, "q")
        return lo.astype(jnp.int64)[None], w[None], wmax

    fn = shard_map(step, mesh=mesh, in_specs=(P("q", None), P()),
                   out_specs=(P("q", None), P("q", None), P()))
    return fn(refk_sh, qt)


@functools.partial(jax.jit, static_argnames=("mesh", "capacity", "block"))
def sharded_expand(mesh: Mesh, sa_sh, lo_sh, w_sh, start, limit,
                   m_off, capacity: int, block: int):
    """Each shard expands its local interval parts for one position block.

    Fixed shapes: full per-shard interval arrays stay on device; the block
    is selected inside the program from (start, limit) scalars.
    """
    from slamem_tpu.engine.seed_mode import (_block_slices,
                                             _expand_pairs_core)

    def step(sa_l, lo_l, w_l, st, lim, m_off):
        lo_b, w_b, qpos0 = _block_slices(lo_l[0], w_l[0], st, lim, block)
        d_s, q_s = _expand_pairs_core(sa_l[0], lo_b, w_b, qpos0, m_off,
                                      capacity)
        return d_s[None], q_s[None]

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("q", None), P("q", None), P("q", None), P(), P(), P()),
        out_specs=(P("q", None), P("q", None)))
    return fn(sa_sh, lo_sh, w_sh, start, limit, m_off)


def find_seed_matches_sharded(index: FMIndex, query_text: np.ndarray,
                              cfg: Config, mesh: Mesh) -> SeedMatches:
    """Seed engine over an SA-rank-sharded index (MEM mode).

    MUM/MAM occurrence counting needs the global pair tables; run with the
    replicated path for those modes (they are bacterial-scale configs).
    """
    if cfg.mode.value != "mem":
        raise NotImplementedError(
            "sharded index currently supports MEM mode; MUM/MAM run on the "
            "replicated-index path")
    k = cfg.seed_length
    qp = seed_mode.pad_query(query_text)
    m = int(qp.shape[0])
    qt = jnp.asarray(qp)
    refk_sh, sa_sh = shard_tables(index, k, mesh)
    lo_l, w_l, w_max = sharded_frontend(mesh, refk_sh, qt, k)

    # plan rounds with the per-shard worst case so every shard fits capacity
    wmax_host = np.asarray(w_max)
    cum = np.concatenate(([0], np.cumsum(wmax_host)))
    capacity = int(cfg.pair_capacity)
    block = min(cfg.position_block, m)
    blocks = seed_mode._plan_blocks(cum, m, capacity, block)
    diag_mod = np.int64(m + block + 2)

    ndev = len(mesh.devices.flat)
    zpad = jnp.zeros((ndev, block), jnp.int64)
    lo_ext = jnp.concatenate([lo_l, zpad], axis=1)
    w_ext = jnp.concatenate([w_l, zpad], axis=1)

    m_off32 = jnp.asarray(int(diag_mod) // 2, jnp.int32)
    batches: list[RunBatch] = []
    for start, end in blocks:
        d_all, q_all = sharded_expand(mesh, sa_sh, lo_ext, w_ext,
                                      jnp.asarray(start, jnp.int64),
                                      jnp.asarray(end, jnp.int64),
                                      m_off32, capacity, block)
        d_h = np.asarray(d_all).ravel()
        q_h = np.asarray(q_all).ravel()
        order = np.lexsort((q_h, d_h))
        batches.append(seed_mode.runs_from_sorted_pairs(
            d_h[order], q_h[order], int(diag_mod) // 2, k,
            want_pairs=False))
    runs = merge_runs(batches) if batches else RunBatch(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))
    length = runs.qend - runs.qstart + k
    keep = length >= cfg.min_length
    return SeedMatches(refpos=(runs.diag + runs.qstart)[keep],
                       qpos=runs.qstart[keep], length=length[keep])
