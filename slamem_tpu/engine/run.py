"""Engine orchestration: FASTA sets -> per-query match listings.

Mirrors the reference's control flow (SURVEY.md §3.1-§3.2): load reference →
build index → for each query sequence (and strand with -b) → search → filter
→ report, with the search itself delegated to the batched seed engine (or the
scan engine once selected via Config.engine).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from slamem_tpu.config import Config
from slamem_tpu.engine import seed_mode
from slamem_tpu.index.build import FMIndex, build_index
from slamem_tpu.io.fasta import FastaSet, revcomp_codes


@dataclasses.dataclass
class QueryMatches:
    """Matches of one query sequence on one strand, in reporting coordinates.

    Positions are 0-based here; the formatter adds the reference's 1-based
    convention at the last moment (report/format.py).
    """

    query_name: str
    reverse: bool
    ref_seq: np.ndarray   # int: index into EngineOutput.ref_names
    ref_pos: np.ndarray   # 0-based position within that reference sequence
    q_pos: np.ndarray     # 0-based position within the (strand-adjusted) query
    length: np.ndarray


@dataclasses.dataclass
class EngineOutput:
    ref_names: list[str]
    per_query: list[QueryMatches]
    stats: dict


def _search_one(index: FMIndex, qcodes: np.ndarray, cfg: Config,
                mesh=None) -> seed_mode.SeedMatches:
    if cfg.engine == "seed":
        if cfg.shard_index and (mesh is not None
                                or (cfg.shard_slabs or 1) > 1):
            from slamem_tpu.dist.sharded import find_seed_matches_sharded

            matches = find_seed_matches_sharded(index, qcodes, cfg, mesh,
                                                n_slabs=cfg.shard_slabs)
        else:
            matches = seed_mode.find_seed_matches(index, qcodes, cfg,
                                                  mesh=mesh)
    elif cfg.engine == "scan":
        if mesh is not None:
            raise ValueError(
                "-engine scan is the single-device §3.2-shape parity engine; "
                "it does not support -shard or multi-host meshes (use the "
                "default seed engine)")
        from slamem_tpu.engine import scan_mode

        matches = scan_mode.find_scan_matches(index, qcodes, cfg)
    else:
        raise ValueError(f"unknown engine {cfg.engine!r}")
    return matches  # mode filter applied per (sequence, strand) by callers


def run_engine(ref_set: FastaSet, query_set: FastaSet, cfg: Config,
               index: FMIndex | None = None, mesh=None) -> EngineOutput:
    from slamem_tpu.utils.log import NULL_LOG, PhaseLog

    log = PhaseLog(enabled=True) if cfg.verbose else NULL_LOG
    t0 = time.perf_counter()
    rtext, rstarts = ref_set.with_separators()
    with log.phase("index_build", bp=len(rtext)):
        if index is None:
            index = build_index(rtext, cfg.occ_block)
        import jax

        jax.block_until_ready(index.sa)  # async dispatch fakes timings
    t_build = time.perf_counter() - t0

    from slamem_tpu.utils.profile import maybe_trace

    per_query: list[QueryMatches] = []
    total = 0
    qbp = 0
    t1 = time.perf_counter()
    strands = [False, True] if cfg.both_strands else [False]

    def _emit(qi: int, rev: bool, m, qoff: int) -> None:
        nonlocal total
        from slamem_tpu.engine.seed_mode import _sort_diag_qstart

        # emission order is (qpos, refpos); the packed-key argsort is ~2x
        # np.lexsort at chr-scale match counts
        order = _sort_diag_qstart(m.qpos, m.refpos)
        refpos, qpos, length = (m.refpos[order], m.qpos[order] - qoff,
                                m.length[order])
        seq_id, local = ref_set.locate_in_text(refpos, rstarts)
        per_query.append(QueryMatches(
            query_name=query_set.names[qi], reverse=rev,
            ref_seq=seq_id, ref_pos=local, q_pos=qpos, length=length))
        total += int(length.size)

    def _attach_roofline(rec: dict, m) -> None:
        # roofline fields (SURVEY.md §5: achieved GB/s IS the project metric)
        if m.stats:
            rec.update(pairs=m.stats["pairs"], rounds=m.stats["rounds"],
                       seed_k=m.stats["k"], bytes=m.stats["bytes_min"],
                       stride=m.stats.get("stride", 1))

    def _run_queries() -> None:
        nonlocal qbp
        if query_set.num_seqs > 1 or cfg.both_strands:
            # Every (sequence, strand) combination joins into ONE
            # separator-delimited text — a single engine dispatch for the
            # whole request (BASELINE config #2 shape; -b gets both strands
            # in the same dispatch). MUM/MAM uniqueness is per (sequence,
            # strand) — slaMEM walks one query at a time (SURVEY.md §3.2) —
            # so the containment filter runs on each entry's slice, whose
            # query-coordinate range is disjoint from every other entry's.
            entries = [(qi, rev) for qi in range(query_set.num_seqs)
                       for rev in strands]
            # memoize the joined request text ON the query set: a repeated
            # identical request (the serving dedup case, and every bench
            # repeat) reuses the same array OBJECT, so query_to_device's
            # id-memoization also skips the multi-MB re-upload — without
            # this, config #2 repeats paid a joined-text rebuild + full
            # upload that every single-query config memoizes away.
            # CONTRACT (ADVICE r4): FastaSet is treated as immutable, like
            # every id()-memoized array in the engine; the key carries
            # id(query_set.codes) so replacing the codes array (the only
            # legal "mutation") invalidates the cache.
            cache = getattr(query_set, "_joined_cache", None)
            if (cache is not None
                    and cache[0] == (tuple(strands), id(query_set.codes))):
                qtext, qstarts = cache[1], cache[2]
            else:
                parts = []
                for qi, rev in entries:
                    codes = query_set.sequence(qi).codes
                    parts.append(revcomp_codes(codes) if rev else codes)
                lengths = np.array([len(p) for p in parts], dtype=np.int64)
                joined = FastaSet(
                    names=[f"{qi}/{rev}" for qi, rev in entries],
                    starts=np.concatenate(([0], np.cumsum(lengths)[:-1])),
                    lengths=lengths, codes=np.concatenate(parts))
                qtext, qstarts = joined.with_separators()
                query_set._joined_cache = (
                    (tuple(strands), id(query_set.codes)), qtext, qstarts)
            qbp += int(query_set.lengths.sum()) * len(strands)
            with log.phase("query", bp=len(qtext),
                           entries=len(entries)) as rec:
                m = _search_one(index, qtext, cfg, mesh=mesh)
                _attach_roofline(rec, m)
            entry_of_match = np.searchsorted(qstarts, m.qpos,
                                             side="right") - 1
            for e, (qi, rev) in enumerate(entries):  # ref emission order
                sel = entry_of_match == e
                sub = seed_mode.apply_mode_filter(seed_mode.SeedMatches(
                    m.refpos[sel], m.qpos[sel], m.length[sel]), cfg)
                _emit(qi, rev, sub, int(qstarts[e]))
        else:
            for qi in range(query_set.num_seqs):
                for rev in strands:
                    qcodes = query_set.sequence(qi).codes
                    if rev:
                        qcodes = revcomp_codes(qcodes)
                    qbp += len(qcodes)
                    with log.phase("query", bp=len(qcodes),
                                   seq=query_set.names[qi],
                                   reverse=rev) as rec:
                        m = seed_mode.apply_mode_filter(
                            _search_one(index, qcodes, cfg, mesh=mesh), cfg)
                        _attach_roofline(rec, m)
                    _emit(qi, rev, m, 0)

    # Perfetto device trace of the whole query stream when SLAMEM_TRACE_DIR
    # is set (SURVEY.md §5 tracing)
    with maybe_trace("query"):
        _run_queries()
    t_query = time.perf_counter() - t1
    stats = {
        "index_build_s": t_build,
        "query_s": t_query,
        "query_bp": qbp,
        "matches": total,
        "query_mbp_per_s": (qbp / 1e6) / t_query if t_query > 0 else 0.0,
    }
    return EngineOutput(ref_names=ref_set.names, per_query=per_query,
                        stats=stats)
