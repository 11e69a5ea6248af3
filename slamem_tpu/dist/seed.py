"""Data-parallel seed-engine steps over a device mesh.

The FM-index arrays are replicated; query-position blocks stream data-parallel
along the ``q`` mesh axis (BASELINE north star). Each device expands its block
into sorted (diag, qpos) int32 pairs; a psum merges the global candidate
count (the cheap collective statistic) and the pair blocks are gathered for
host run extraction. shard_map keeps per-device shapes static — the same
expansion core as the single-chip path, no divergence between the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from slamem_tpu.engine.seed_mode import _I32MAX

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@functools.partial(jax.jit,
                   static_argnames=("mesh", "capacity", "run_capacity",
                                    "block", "stride"))
def expand_runs_gathered(mesh: Mesh, sa_aug: jax.Array,
                         lo_ext: jax.Array, w_ext: jax.Array,
                         starts: jax.Array, limits: jax.Array,
                         m_off, capacity: int, run_capacity: int,
                         block: int, stride: int = 1):
    """PRODUCTION mesh MEM path: per-device run compaction + collective
    merge (BASELINE north star "merged and deduplicated via all_gather/psum
    collectives before emission").

    Each device expands its position block, sorts pairs, and compacts them
    to run-boundary triples ON DEVICE (engine.seed_mode._compact_pair_runs);
    the triples are then all_gather'ed in deterministic device order and the
    psum'd global pair count rides along — the host receives ONE replicated
    [ndev, run_capacity] set of int32 triples instead of ndev x capacity raw
    pairs, and performs no pair sorting at all.
    """
    from slamem_tpu.engine.seed_mode import (_block_slices,
                                             _compact_pair_runs,
                                             _expand_pairs_core)

    def step(sa_aug, lo, w, st, lim, m_off):
        lo_b, w_b, q_start = _block_slices(lo, w, st[0], lim[0], block)
        d_s, q_s = _expand_pairs_core(sa_aug, lo_b, w_b, q_start, m_off,
                                      capacity, stride)
        run_d, run_qs, run_qe, n_runs, n_pairs = _compact_pair_runs(
            d_s, q_s, run_capacity)
        total = jax.lax.psum(n_pairs, "q")
        gd = jax.lax.all_gather(run_d, "q")       # [ndev, run_capacity]
        gqs = jax.lax.all_gather(run_qs, "q")
        gqe = jax.lax.all_gather(run_qe, "q")
        gnr = jax.lax.all_gather(n_runs, "q")     # [ndev]
        return gd, gqs, gqe, gnr, total

    # check_vma off: the outputs ARE replicated (all_gather / psum results),
    # but this jax's varying-axes inference does not propagate that
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P("q"), P("q"), P()),
        out_specs=(P(), P(), P(), P(), P()), check_vma=False)
    return fn(sa_aug, lo_ext, w_ext, starts, limits, m_off)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "k", "capacity", "run_capacity",
                                    "block"))
def expand_boundaries_gathered(mesh: Mesh, text: jax.Array, qt: jax.Array,
                               sa_aug: jax.Array, lo_ext: jax.Array,
                               w_ext: jax.Array, starts: jax.Array,
                               limits: jax.Array, m_off, k: int,
                               capacity: int, run_capacity: int,
                               block: int):
    """PRODUCTION mesh MEM path: per-device boundary flags + collective
    merge (BASELINE north star "merged and deduplicated via all_gather/psum
    collectives before emission").

    Each device expands its position block and computes character-flag run
    boundaries (engine.seed_mode._expand_flags_core — no pair sort); the
    start/end events are all_gather'ed in deterministic device order and
    the psum'd global pair count rides along. Boundary flags are global
    properties of each pair, so device partitioning cannot fragment a run —
    the host only matches the k-th start with the k-th end per diagonal.
    """
    from slamem_tpu.engine.seed_mode import (_block_slices,
                                             _expand_flags_core)

    def step(text, qt, sa_aug, lo, w, st, lim, m_off):
        lo_b, w_b, q_start = _block_slices(lo, w, st[0], lim[0], block)
        sd, sq, ed, eq, ns, ne, npair = _expand_flags_core(
            text, qt, sa_aug, lo_b, w_b, q_start, m_off, k, capacity,
            run_capacity)
        total = jax.lax.psum(npair, "q")
        return (jax.lax.all_gather(sd, "q"), jax.lax.all_gather(sq, "q"),
                jax.lax.all_gather(ed, "q"), jax.lax.all_gather(eq, "q"),
                jax.lax.all_gather(ns, "q"), jax.lax.all_gather(ne, "q"),
                total)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("q"), P("q"), P()),
        out_specs=(P(), P(), P(), P(), P(), P(), P()), check_vma=False)
    return fn(text, qt, sa_aug, lo_ext, w_ext, starts, limits, m_off)


@functools.partial(jax.jit, static_argnames=("mesh", "capacity"))
def full_query_step(mesh: Mesh, refk, sa_aug: jax.Array,
                    qk, qvalid: jax.Array,
                    qpos0: jax.Array, m_off: jax.Array, capacity: int):
    """One complete distributed query step, jitted end to end.

    This is the "training step" analogue the driver dry-runs over an
    n-device mesh: replicated index (refk words/sa_aug), query K-mers
    sharded [ndev, B] along ``q``, per-shard sorted-search + expansion +
    sort + run compaction, psum of the candidate count and all_gather of
    the merged run triples (the production collective-merge shape, see
    expand_runs_gathered).
    """
    from slamem_tpu.engine.seed_mode import (_compact_pair_runs,
                                             _expand_pairs_core,
                                             _join_intervals)

    run_capacity = max(64, capacity // 4)

    def step(refk, sa_aug, qk, qv, q0, m_off):
        refk_w = refk if isinstance(refk, tuple) else (refk,)
        qk_w = tuple(w[0] for w in (qk if isinstance(qk, tuple) else (qk,)))
        qv1 = qv[0]
        q_start = q0[0, 0]  # each shard's block is a contiguous range
        lo, width = _join_intervals(refk_w, qk_w, qv1)
        d_s, q_s = _expand_pairs_core(sa_aug, lo, width, q_start, m_off,
                                      capacity)
        total = jax.lax.psum(jnp.sum(d_s != _I32MAX), "q")
        run_d, run_qs, run_qe, n_runs, _ = _compact_pair_runs(
            d_s, q_s, run_capacity)
        gd = jax.lax.all_gather(run_d, "q")
        gqs = jax.lax.all_gather(run_qs, "q")
        gqe = jax.lax.all_gather(run_qe, "q")
        gnr = jax.lax.all_gather(n_runs, "q")
        return gd, gqs, gqe, gnr, total[None]

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P("q", None), P("q", None), P("q", None), P()),
        out_specs=(P(), P(), P(), P(), P("q")), check_vma=False)
    return fn(refk, sa_aug, qk, qvalid, qpos0, m_off)
