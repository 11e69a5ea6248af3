#!/usr/bin/env python
"""Headline benchmark: query Mbp/s per chip (BASELINE.json metric).

Scenario: synthetic E. coli-scale strain pair (5 Mbp, ~1.5% SNPs + indels —
matched statistics for BASELINE config #1; real FASTA not provisioned in this
sandbox, SURVEY.md §6), MEM mode, -l 20. The timed region is the full query
phase (seed search, pair expansion, sort, run extraction and merge), index
build excluded — the index is a reusable checkpoint (SURVEY.md §5).

Cold-process discipline (VERDICT r3 #1 — round 3's official bench TIMED OUT):
  * a heartbeat line goes to stderr at every stage, so a timeout is
    attributable to a stage, never a mystery;
  * warmup is CONVERGENCE warmup: the engine's adaptive buffer plan
    (seed_mode.plan_fused) is compared before/after each call and timing
    starts only when two consecutive plans agree — repeats never absorb a
    shape-family compile;
  * the adaptive plan persists on disk (engine/adaptive.py), so a cold
    process dispatches the converged shape family on its FIRST call — one
    compile-cache load instead of three;
  * --budget <s> (default $BENCH_BUDGET_S or 500) bounds the run: when the
    deadline nears, fewer repeats are timed, and the headline is emitted
    from what was measured rather than nothing.

vs_baseline: ratio against a single-CPU-thread run of the same engine
(BASELINE config #1 demands "single CPU thread" reference semantics; the 2014
binary is unobtainable here — SURVEY.md §0). Calibrate once with:
    taskset -c 0 python bench.py --calibrate
which stores the CPU number + provenance in BENCH_BASELINE.json.

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.perf_counter()
SIZE = 5_000_000
MINLEN = 20
HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(HERE, "BENCH_BASELINE.json")
_DEADLINE: float | None = None   # wall-clock perf_counter deadline


def hb(msg: str) -> None:
    """Heartbeat to stderr: stage name + seconds since process start."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def time_left() -> float:
    return float("inf") if _DEADLINE is None else _DEADLINE - time.perf_counter()


def build_inputs(size: int):
    from slamem_tpu.utils.synth import strain_pair

    return strain_pair(size, seed=20260816, sub_rate=0.015, indel_rate=0.0015)


def converge_and_time(call, plan_of, repeats: int, label: str,
                      max_warmup: int = 4) -> tuple[float, float, int]:
    """(best repeat seconds, last warmup seconds, timed repeat count).

    Warmup runs until the adaptive plan is identical before and after a
    call (that call ran the final compiled shapes) or max_warmup is hit;
    timed repeats then never pay a compile. Budget-aware: stops timing when
    the deadline nears, and reports the last warmup time if no repeat fit.
    """
    plan_before = plan_of()
    t_warm = None
    for i in range(max_warmup):
        t0 = time.perf_counter()
        call()
        t_warm = time.perf_counter() - t0
        hb(f"{label}: warmup {i} {t_warm:.3f}s")
        plan_after = plan_of()
        if plan_after == plan_before:
            break
        plan_before = plan_after
        if time_left() < 3 * t_warm:
            hb(f"{label}: budget low, stopping warmup")
            break
    times = []
    for _ in range(repeats):
        if times and time_left() < 2 * times[-1]:
            hb(f"{label}: budget low, {len(times)} repeats timed")
            break
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    return (min(times) if times else t_warm), t_warm, len(times)


def run_bench(size: int, minlen: int, repeats: int = 5) -> dict:
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.log import V5E_HBM_GBPS

    hb(f"inputs: synth strain pair {size/1e6:.0f} Mbp")
    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen)
    hb("index build: start")
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    t_build = time.perf_counter() - t0
    hb(f"index build: done {t_build:.1f}s")

    m_p = int(sm.pad_query(qry).shape[0])
    state = {}

    def call():
        state["m"] = sm.find_seed_matches(index, qry, cfg)

    t_query, t_warm, n_rep = converge_and_time(
        call, lambda: sm.plan_fused(index, m_p, cfg, qry), repeats,
        f"query {size/1e6:.0f}Mbp l{minlen}")
    m = state["m"]

    # one-shot serving reality (VERDICT r3 weak #8): a fresh query pays the
    # host->device upload the memoized repeats skip — measure it and report
    # both rates side by side. Min of 3 cache-busted uploads: the tunnel's
    # FIRST fresh transfer of a new buffer runs ~1-1.5 s slower than its
    # steady state (measured r5; the 2-bit packed wire itself is ~4x
    # smaller either way), and one_shot should price the steady state.
    t_upload = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sm.query_to_device(qry.copy())
        t_upload = min(t_upload, time.perf_counter() - t0)

    res = {
        "mbp_per_s": (len(qry) / 1e6) / t_query,
        "one_shot_mbp_per_s": (len(qry) / 1e6) / (t_query + t_upload),
        "query_s": t_query,
        "upload_s": t_upload,
        "warmup_last_s": t_warm,
        "timed_repeats": n_rep,
        "build_s": t_build,
        "matches": int(m.length.size),
        "query_bp": len(qry),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    if m.stats:  # roofline detail (SURVEY.md §5: the project metric frame)
        gbps = m.stats["bytes_min"] / 1e9 / t_query
        res.update(pairs=m.stats["pairs"], rounds=m.stats["rounds"],
                   seed_k=m.stats["k"], bytes_min=m.stats["bytes_min"],
                   gb_per_s=gbps, hbm_fraction=gbps / V5E_HBM_GBPS)
    return res


def run_config2_bench(size: int = 5_000_000, strains: int = 10,
                      minlen: int = 30, repeats: int = 4) -> dict:
    """BASELINE config #2 stand-in: 10 mutated strains (multi-FASTA query)
    vs one reference, -l 30, through the full engine (per-strain batched
    dispatch + formatting order)."""
    import os as _os
    import tempfile

    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.run import run_engine
    from slamem_tpu.io import Sequence, read_fasta, write_fasta
    from slamem_tpu.utils.synth import mutate

    ref, _ = build_inputs(size)
    seqs = [Sequence(f"strain{j}", mutate(ref, 0.01 + 0.001 * j, 0.001,
                                          seed=100 + j))
            for j in range(strains)]
    with tempfile.TemporaryDirectory() as td:
        write_fasta(_os.path.join(td, "r.fa"), [Sequence("ref", ref)])
        write_fasta(_os.path.join(td, "q.fa"), seqs)
        ref_set = read_fasta(_os.path.join(td, "r.fa"))
        qry_set = read_fasta(_os.path.join(td, "q.fa"))
    cfg = Config(min_length=minlen)
    from slamem_tpu.index.build import build_index
    rtext, _ = ref_set.with_separators()
    hb("config2: index build")
    index = build_index(rtext, cfg.occ_block)
    jax.block_until_ready(index.sa)
    state = {}

    def call():
        state["out"] = run_engine(ref_set, qry_set, cfg, index=index)

    # convergence warmup on the JOINED request's plan (r5: two fixed
    # warmups let a late snapped-shape compile land inside a timed repeat
    # — a 39 s draw in a 1 s scenario)
    joined_converge(call, index, qry_set, cfg, "config2")
    times = []
    for _ in range(repeats):
        if times and time_left() < 2 * times[-1]:
            break
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    dt = min(times) if times else float("nan")
    out = state["out"]
    qbp = int(sum(len(s.codes) for s in seqs))
    return {
        "mbp_per_s": qbp / 1e6 / dt,
        "query_s": dt,
        "query_bp": qbp,
        "strains": strains,
        "matches": int(sum(qm.length.size for qm in out.per_query)),
        "device": str(jax.devices()[0]),
    }


def run_chr1_bench(size: int = 250_000_000, query_bp: int = 50_000_000,
                   minlen: int = 50, repeats: int = 5,
                   n_slabs: int = 8) -> dict:
    """BASELINE config #5: chr1-scale pair (250 Mbp reference, 50 Mbp query
    slice, dissimilar-genome mutation rates), BOTH engine shapes on the one
    real chip:

    * replicated fused engine (the fastest single-chip program, DESIGN §5c);
    * the TRUE multi-slab sharded program (VERDICT r4 #1) — per-slab ranged
      tables, slab frontends, per-slab expansion, host merge — with
      ``n_slabs`` slabs iterated on-device (dist/sharded.py virtual slabs),
      sharing this scenario's index build. Its row lands in BENCH_DETAIL as
      chr1_sharded_250mbp_l50 with a matches count that must equal the
      replicated row's.
    """
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.dist.sharded import find_seed_matches_sharded
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    hb("chr1: inputs")
    ref, qry = strain_pair(size, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:query_bp]
    hb("chr1: index build (250 Mbp)")
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    t_build = time.perf_counter() - t0
    hb(f"chr1: index built {t_build:.1f}s")
    cfg = Config(min_length=minlen)
    m_p = int(sm.pad_query(qry).shape[0])
    state = {}

    def call():
        state["m"] = sm.find_seed_matches(index, qry, cfg)

    dt, _tw, _nr = converge_and_time(
        call, lambda: sm.plan_fused(index, m_p, cfg, qry), repeats, "chr1")
    m = state["m"]
    res = {
        "mbp_per_s": len(qry) / 1e6 / dt,
        "query_s": dt,
        "build_s": t_build,
        "query_bp": len(qry),
        "matches": int(m.length.size),
        "device": str(jax.devices()[0]),
    }
    if m.stats:
        res.update(pairs=m.stats["pairs"], seed_k=m.stats["k"],
                   stride=m.stats.get("stride", 1))

    if n_slabs and n_slabs > 1 and time_left() > 120:
        hb(f"chr1: sharded program ({n_slabs} slabs on one chip)")
        sh_state = {}

        def sh_call():
            sh_state["m"] = find_seed_matches_sharded(index, qry, cfg, None,
                                                      n_slabs=n_slabs)
        ts = []
        for i in range(max(2, min(repeats, 3))):
            t0 = time.perf_counter()
            sh_call()
            ts.append(time.perf_counter() - t0)
            hb(f"chr1 sharded: call {i} {ts[-1]:.3f}s")
            if time_left() < 2 * ts[-1]:
                break
        dt_sh = min(ts[1:]) if len(ts) > 1 else ts[0]
        ms = sh_state["m"]
        res["sharded"] = {
            "mbp_per_s": len(qry) / 1e6 / dt_sh,
            "query_s": dt_sh,
            "n_slabs": n_slabs,
            "matches": int(ms.length.size),
            "matches_equal_replicated":
                int(ms.length.size) == int(m.length.size),
            "pairs": ms.stats.get("pairs") if ms.stats else None,
            "query_bp": len(qry),
            "device": str(jax.devices()[0]),
        }
    return res


def joined_converge(call, index, query_set, cfg, label: str,
                    max_warmup: int = 6) -> None:
    """Warm a joined-request scenario until plan_fused stabilizes.

    The joined text only exists after run_engine's first call (memoized on
    the query set), so the plan is read from that cache; two consecutive
    equal plans mean the compiled shape family is final (same contract as
    converge_and_time)."""
    from slamem_tpu.engine import seed_mode as sm

    def plan_of():
        cache = getattr(query_set, "_joined_cache", None)
        if cache is None:
            return None
        qtext = cache[1]
        return sm.plan_fused(index, int(sm.pad_query(qtext).shape[0]),
                             cfg, qtext)

    plan_before = plan_of()
    for i in range(max_warmup):
        t0 = time.perf_counter()
        call()
        hb(f"{label}: warmup {i} {time.perf_counter() - t0:.3f}s")
        plan_after = plan_of()
        # i >= 2: the tunnel's dispatch pipeline itself needs ~3 calls to
        # steady state (measured r5: 2.5 -> 1.1 s at a stable plan)
        if plan_after == plan_before and i >= 2:
            break
        plan_before = plan_after


def run_throughput_bench(size: int = 5_000_000, strains: int = 10,
                         minlen: int = 30, repeats: int = 6) -> dict:
    """Throughput serving mode as a first-class headline (VERDICT r4 #6).

    Joining policy (run_engine, DESIGN.md §9): when a request carries
    multiple query sequences (multi-FASTA, several query files, or -b),
    every (sequence, strand) entry concatenates into ONE separator-joined
    text and the engine runs ONE fused dispatch for the whole request —
    the fixed per-dispatch terms (tunnel turnaround, wire, host decode)
    amortize over the aggregate Mbp instead of recurring per query. The
    headline row is the config-#2 joined shape (10 x 5 Mbp strains =
    50 Mbp aggregate, -l 30) with aggregate Mbp/s, memoized-repeat and
    one-shot (fresh FastaSet: join + pack + upload included); a doubled
    100 Mbp point rides along as `x2` — its marginal rate is lower
    because the match-set wire and host decode scale with output
    (~1.06M matches at 100 Mbp vs 478K), not with the fixed terms the
    joining amortizes.
    """
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.run import run_engine
    from slamem_tpu.index.build import build_index
    from slamem_tpu.io.fasta import FastaSet, Sequence
    from slamem_tpu.utils.synth import mutate

    import numpy as np

    ref, _ = build_inputs(size)
    seqs = [Sequence(f"strain{j}", mutate(ref, 0.01 + 0.001 * j, 0.001,
                                          seed=300 + j))
            for j in range(strains)]

    def make_query_set():
        lengths = np.array([len(s.codes) for s in seqs], dtype=np.int64)
        return FastaSet(
            names=[s.name for s in seqs],
            starts=np.concatenate(([0], np.cumsum(lengths)[:-1])),
            lengths=lengths,
            codes=np.concatenate([s.codes for s in seqs]))

    ref_set = FastaSet(names=["ref"], starts=np.zeros(1, np.int64),
                       lengths=np.array([len(ref)], np.int64), codes=ref)
    qry_set = make_query_set()
    cfg = Config(min_length=minlen)
    rtext, _ = ref_set.with_separators()
    hb("throughput: index build")
    index = build_index(rtext, cfg.occ_block)
    jax.block_until_ready(index.sa)
    state = {}

    def call():
        state["out"] = run_engine(ref_set, qry_set, cfg, index=index)

    joined_converge(call, index, qry_set, cfg, "throughput")
    times = []
    for _ in range(repeats):
        if times and time_left() < 2 * times[-1]:
            break
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    dt = min(times) if times else float("nan")
    # one-shot: a FRESH request object pays join + 2-bit pack + upload
    fresh = make_query_set()
    t0 = time.perf_counter()
    out_fresh = run_engine(ref_set, fresh, cfg, index=index)
    dt_one = time.perf_counter() - t0
    out = state["out"]
    qbp = int(sum(len(s.codes) for s in seqs))
    matches = int(sum(qm.length.size for qm in out.per_query))
    assert matches == int(sum(qm.length.size for qm in out_fresh.per_query))
    res = {
        "mbp_per_s": qbp / 1e6 / dt,
        "one_shot_mbp_per_s": qbp / 1e6 / dt_one,
        "query_s": dt,
        "one_shot_s": dt_one,
        "query_bp": qbp,
        "strains": strains,
        "matches": matches,
        "device": str(jax.devices()[0]),
    }
    if time_left() > 120:   # doubled-aggregate point (see docstring)
        seqs2 = seqs + [Sequence(f"strain{j}",
                                 mutate(ref, 0.01 + 0.001 * (j % 10), 0.001,
                                        seed=300 + j))
                        for j in range(strains, 2 * strains)]
        lengths2 = np.array([len(s.codes) for s in seqs2], dtype=np.int64)
        qry2 = FastaSet(
            names=[s.name for s in seqs2],
            starts=np.concatenate(([0], np.cumsum(lengths2)[:-1])),
            lengths=lengths2,
            codes=np.concatenate([s.codes for s in seqs2]))
        st2 = {}

        def call2():
            st2["out"] = run_engine(ref_set, qry2, cfg, index=index)

        joined_converge(call2, index, qry2, cfg, "throughput x2")
        times2 = []
        for _ in range(repeats):
            if times2 and time_left() < 2 * times2[-1]:
                break
            t0 = time.perf_counter()
            call2()
            times2.append(time.perf_counter() - t0)
        dt2 = min(times2) if times2 else float("nan")
        qbp2 = int(lengths2.sum())
        res["x2"] = {
            "mbp_per_s": qbp2 / 1e6 / dt2,
            "query_s": dt2,
            "query_bp": qbp2,
            "strains": 2 * strains,
            "matches": int(sum(qm.length.size
                               for qm in st2["out"].per_query)),
        }
    return res


def run_mam_bench(size: int = 5_000_000, minlen: int = 20,
                  repeats: int = 4) -> dict:
    """BASELINE config #3: MAM (reference-unique) mode on the E. coli pair.

    Uniqueness is decided from the match set alone (run-containment,
    apply_mode_filter), so MAM rides the same fused sparse-seeded fast
    path as MEM plus one vectorized host filter.
    """
    import jax

    from slamem_tpu.config import Config, MatchMode
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.engine.seed_mode import apply_mode_filter, \
        find_seed_matches
    from slamem_tpu.index.build import build_index

    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen, mode=MatchMode.MAM)
    hb("mam: index build")
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    m_p = int(sm.pad_query(qry).shape[0])
    state = {}

    def call():
        state["m"] = apply_mode_filter(find_seed_matches(index, qry, cfg),
                                       cfg)

    dt, _tw, _nr = converge_and_time(
        call, lambda: sm.plan_fused(index, m_p, cfg, qry), repeats, "mam")
    return {
        "mbp_per_s": len(qry) / 1e6 / dt,
        "query_s": dt,
        "matches": int(state["m"].length.size),
        "device": str(jax.devices()[0]),
    }


def run_stage_bench(size: int = SIZE, minlen: int = MINLEN,
                    repeats: int = 3) -> dict:
    """Device-synced stage budget of the headline fused path.

    Reproduces find_seed_matches' single-dispatch plan (via the shared
    seed_mode.plan_fused authority) and grounds each stage on a host fetch
    (block_until_ready is unreliable on the axon tunnel — see
    .claude/skills/verify): round-trip latency, query upload, frontend-only
    dispatch, full fused dispatch, wire fetch, host decode, and the
    end-to-end engine call they add up to.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index

    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen)
    hb("stages: index build")
    index = build_index(ref)
    jax.block_until_ready(index.sa)

    def best(fn, n=repeats):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # converge adaptive capacities + compile everything
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    plan = sm.plan_fused(index, m_p, cfg, qry)
    for _ in range(3):
        sm.find_seed_matches(index, qry, cfg)
        nxt = sm.plan_fused(index, m_p, cfg, qry)
        if nxt == plan:
            break
        plan = nxt
    t_end_to_end = best(lambda: sm.find_seed_matches(index, qry, cfg))

    # reproduce the engine's dispatches at the converged plan
    k, stride = plan.k, plan.stride
    capacity, run_cap, kept_cap = plan.capacity, plan.run_cap, plan.kept_cap
    split, use_bucket = plan.split, plan.use_bucket
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index) if stride != 1 else None
    ext_q = sm.query_ext_table(qt) if stride != 1 else None
    probes = 12
    if use_bucket:
        starts, shift, probes = sm.bucket_table(index, k)
    minl = int(cfg.min_length)

    # stage 0: bare dispatch+fetch round trip (1 scalar through the tunnel)
    one = jnp.zeros((1,), jnp.int32) + 1
    np.asarray(one)
    t_rtt = best(lambda: np.asarray(one))

    # stage 1: query upload (cache-busted: fresh array object each repeat)
    def upload():
        q2 = qry.copy()
        qp2, qt2 = sm.query_to_device(q2)
        np.asarray(qt2[:1])
    t_upload = best(upload)

    # stage 2: frontend only (join or bucket search), grounded on the
    # 2-int64 summary fetch
    if use_bucket:
        def frontend():
            lo, w, cum, summ = sm.query_frontend_bucket(
                refk, starts, qt, k, shift, probes, stride)
            np.asarray(summ)
    else:
        def frontend():
            lo, w, cum, summ = sm.query_frontend(refk, qt, k, stride)
            np.asarray(summ)
    frontend()
    t_frontend = best(frontend)

    # stage 3: full fused dispatch, grounded on the summary fetch (all
    # outputs of one XLA computation materialize together)
    state = {}

    def fused():
        if use_bucket:
            out = sm.fused_query_bucket(
                index.text, refk, starts, sa_aug, qt, k, capacity, run_cap,
                shift, probes, cfg.match_backend, stride, ext_r,
                kept_capacity=kept_cap, minlen=minl, split=split,
                ext_q=ext_q, elig_capacity=plan.elig_cap)
        else:
            out = sm.fused_query(
                index.text, refk, sa_aug, qt, k, capacity, run_cap,
                cfg.match_backend, stride, ext_r,
                kept_capacity=kept_cap, minlen=minl, split=split,
                ext_q=ext_q, elig_capacity=plan.elig_cap)
        state["packed"] = out[3]   # (lo, width, summary, packed)
        np.asarray(out[2])
    fused()
    t_fused = best(fused)

    # stage 4: wire fetch of the already-computed packed array
    t_wire = best(lambda: np.asarray(state["packed"]))
    wire = np.asarray(state["packed"])
    n_kept = int(wire[-4])

    # stage 5: host decode (run triples -> filtered SeedMatches arrays)
    def decode():
        runs = sm.runs_from_compacted32(
            wire[:kept_cap], wire[kept_cap:2 * kept_cap],
            wire[2 * kept_cap:3 * kept_cap], n_kept, m_p + 1)
        length = runs.qend - runs.qstart + k
        keep = length >= minl
        return (runs.diag + runs.qstart)[keep], runs.qstart[keep], \
            length[keep]
    t_decode = best(decode)

    return {
        "end_to_end_s": t_end_to_end,
        "rtt_s": t_rtt,
        "upload_s": t_upload,
        "frontend_s": t_frontend,
        "fused_dispatch_s": t_fused,
        "expansion_sort_s": t_fused - t_frontend,
        "wire_fetch_s": t_wire,
        "host_decode_s": t_decode,
        "accounted_s": t_fused + t_wire + t_decode,
        "mbp_per_s": len(qry) / 1e6 / t_end_to_end,
        "one_shot_mbp_per_s": len(qry) / 1e6 / (t_end_to_end + t_upload),
        "plan": {"k": k, "stride": stride, "bucket": use_bucket,
                 "probes": probes, "capacity": capacity,
                 "run_cap": run_cap, "kept_cap": kept_cap,
                 "wire_bytes": int(wire.nbytes), "n_kept": n_kept,
                 "m_padded": m_p},
        "device": str(jax.devices()[0]),
    }


def run_rank_bench(size: int = 5_000_000, batch: int = 1 << 22,
                   repeats: int = 3) -> dict:
    """Rank/occ roofline: one interleaved row per query.

    Device-resident timing (VERDICT r2 weak #7): the batch is consumed
    with .sum() and only that scalar crosses the tunnel, so the recorded
    GB/s measures the kernel, not the ~24 ms/fetch + 16 ms/MB wire. Times
    the nibble-SWAR XLA path (the production default) at 512 B / 2 KB /
    4 KB rows, a ROW-SORTED 2 KB variant (the concurrency attack VERDICT
    r3 #4 asked for: bin queries by row so DMA streams are sequential),
    the Pallas DMA kernel and the byte-unpack XLA path for the record.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels.rank import (interleaved_rows, nibble_rows,
                                         rank_rows, rank_rows_nib,
                                         rank_rows_xla)
    from slamem_tpu.utils.log import V5E_HBM_GBPS

    ref, _ = build_inputs(size)
    hb("rank: index build")
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    rows_n = nibble_rows(index)
    rows_w = nibble_rows(index, 512)   # 2 KB rows: the bandwidth point
    rows_b = interleaved_rows(index)
    rng = np.random.default_rng(20260817)
    chars = jnp.asarray(rng.integers(0, 4, size=batch).astype(np.int32))
    pos_h = rng.integers(0, index.n + 1, size=batch).astype(np.int32)
    pos = jnp.asarray(pos_h)
    # row-sorted order: same queries, HBM rows visited in ascending order
    order = np.argsort(pos_h, kind="stable")
    chars_s = jnp.asarray(np.asarray(chars)[order])
    pos_s = jnp.asarray(pos_h[order])
    nv = 8192
    want = np.asarray(rank_batch(index, chars[:nv], pos[:nv]))
    got = np.asarray(rank_rows_nib(rows_n, chars[:nv], pos[:nv]))
    got_w = np.asarray(rank_rows_nib(rows_w, chars[:nv], pos[:nv]))
    equal = bool(np.array_equal(want, got) and np.array_equal(want, got_w))

    # nibble_4kb was dropped from the artifact variants (VERDICT r4 weak
    # #5): it never produced a committed number here (r3 OOM, r4 remote-
    # compile 500) and rankc_sweep.log already records the honest 4 KB
    # point (66.3 GB/s on a 128 Mbp working set) — a permanently-errored
    # redundant key is worse than no key.
    variants = {
        "nibble_swar": (512, jax.jit(
            lambda c, p: rank_rows_nib(rows_n, c, p).sum(dtype=jnp.int64))),
        "nibble_2kb": (2048, jax.jit(
            lambda c, p: rank_rows_nib(rows_w, c, p).sum(dtype=jnp.int64))),
        "byte_unpack": (512, jax.jit(
            lambda c, p: rank_rows_xla(rows_b, c, p).sum(dtype=jnp.int64))),
        "pallas_dma": (512, jax.jit(
            lambda c, p: rank_rows(rows_b, c, p).sum(dtype=jnp.int64))),
    }
    inputs = {name: (chars, pos) for name in variants}
    variants["nibble_2kb_sorted"] = variants["nibble_2kb"]
    inputs["nibble_2kb_sorted"] = (chars_s, pos_s)
    out = {}
    for name, (row_bytes, fn) in variants.items():
        c_in, p_in = inputs[name]
        try:
            np.asarray(fn(c_in, p_in))  # compile + warm
        except Exception as e:  # e.g. Pallas compiled mode off-TPU
            if classify_error(str(e)) == "environmental":
                hb(f"rank: {name} environmental error, retrying once")
                try:
                    np.asarray(fn(c_in, p_in))
                except Exception as e2:
                    out[name + "_error"] = str(e2)[:120]
                    continue
            else:
                out[name + "_error"] = str(e)[:120]
                continue
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(c_in, p_in))
            times.append(time.perf_counter() - t0)
        out[name + "_s"] = min(times)
        out[name + "_ns_per_query"] = min(times) / batch * 1e9
        out[name + "_gb_per_s"] = batch * row_bytes / min(times) / 1e9
        hb(f"rank: {name} {out[name + '_gb_per_s']:.1f} GB/s")
    gbps = max(out.get("nibble_2kb_gb_per_s", 0.0),
               out.get("nibble_2kb_sorted_gb_per_s", 0.0),
               out.get("nibble_swar_gb_per_s", 0.0))
    return {
        "rank_gb_per_s": gbps,  # best recorded bandwidth point
        "hbm_fraction": gbps / V5E_HBM_GBPS,
        "queries": batch,
        "equal_vs_rank_batch": equal,
        "device": str(jax.devices()[0]),
        **out,
    }


_ENVIRONMENTAL_PATTERNS = (
    "HTTP 5", "UNAVAILABLE", "DEADLINE", "tunnel", "tpu_compile_helper",
    "subprocess exit", "Connection", "connection", "Socket", "socket",
    "ABORTED", "failed to connect", "Broken pipe",
)


def classify_error(msg: str) -> str:
    """'environmental' (tunnel/remote-compile/transport — retryable, not an
    engine defect) vs 'engine' (everything else). VERDICT r4 weak #2: the
    r4 artifact shipped an HTTP-500 remote-compile failure silently counted
    as zero errors; classification makes the distinction recordable."""
    return ("environmental"
            if any(p in msg for p in _ENVIRONMENTAL_PATTERNS) else "engine")


COLDRUNS_FILE = os.path.join(HERE, "BENCH_COLDRUNS.log")


def isolated_scenario(name, fn, errors: list, *a, **kw):
    """Run one bench scenario with cache isolation + classified errors.

    Device caches are cleared before each attempt (scenario isolation,
    VERDICT r3 missing #3); an ENVIRONMENTAL failure (tunnel/remote
    compile/transport) is retried once when budget remains; any final
    failure is appended to `errors` (the artifact's top-level summary a
    commit message can honestly quote) and returned as an error record
    instead of propagating — no scenario may mask the headline.
    """
    import gc

    from slamem_tpu.utils.devcache import clear_device_caches

    for attempt in (0, 1):
        clear_device_caches()
        gc.collect()
        try:
            return fn(*a, **kw)
        except Exception as e:
            cls = classify_error(str(e))
            hb(f"scenario {name}: {cls} error"
               f"{' (retrying)' if cls == 'environmental' and not attempt else ''}"
               f": {str(e)[:160]}")
            if cls == "environmental" and attempt == 0 \
                    and time_left() > 60:
                continue
            errors.append({"scenario": name, "class": cls,
                           "error": str(e)[:300]})
            return {"error": str(e)[:300], "error_class": cls,
                    "retried": attempt > 0}


def coldrun_stats(values_with_current: list[float]) -> dict:
    import statistics

    v = sorted(values_with_current)
    return {"n": len(v), "median": round(statistics.median(v), 2),
            "min": round(v[0], 2), "max": round(v[-1], 2)}


def _recent_coldruns(limit: int = 20) -> list[float]:
    """Parse the trailing headline values out of BENCH_COLDRUNS.log."""
    vals: list[float] = []
    try:
        with open(COLDRUNS_FILE) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if (rec.get("metric") == "query_mbp_per_s_per_chip"
                        and isinstance(rec.get("value"), (int, float))):
                    vals.append(float(rec["value"]))
    except OSError:
        pass
    return vals[-limit:]


def emit_headline(res: dict, official: bool = True) -> None:
    vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["cpu_single_thread_mbp_per_s"]
        vs = res["mbp_per_s"] / base if base > 0 else None
    payload = {
        "metric": "query_mbp_per_s_per_chip",
        "value": round(res["mbp_per_s"], 3),
        "unit": "Mbp/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    # the official number is a DISTRIBUTION, not one draw (VERDICT r4 #5):
    # cold runs vary +-14% with tunnel jitter, so every official
    # TPU-headline run appends itself to BENCH_COLDRUNS.log and the
    # headline line carries {median, min, max, n} over the recent committed
    # cold runs + this one. Non-headline shapes (--quick/--chr21/--size)
    # and CPU runs never pollute the distribution.
    if official and res.get("platform") not in (None, "cpu"):
        prior = _recent_coldruns()
        payload["cold_runs"] = coldrun_stats(prior + [payload["value"]])
        # the distribution also rides the caller's detail record (the
        # driver's "parsed" field captures the LAST JSON line, which is
        # the stderr detail) — VERDICT r4 #5's "parsed detail includes
        # the distribution, not one draw"
        res["cold_runs"] = payload["cold_runs"]
        try:
            with open(COLDRUNS_FILE, "a") as f:
                f.write(f"## auto-appended by bench.py "
                        f"(unix {int(time.time())}, "
                        f"platform {res.get('platform', '?')})\n")
                f.write(json.dumps(payload) + "\n")
        except OSError:
            pass
    print(json.dumps(payload), flush=True)


def main() -> int:
    global _DEADLINE
    argv = sys.argv[1:]
    calibrate = "--calibrate" in argv
    size = SIZE
    minlen = MINLEN
    if "--quick" in argv:
        size = 1_000_000
    if "--chr21" in argv:  # config #4 stand-in: chr21-scale pair, -l 50
        size = 40_000_000
        minlen = 50
    budget = float(os.environ.get("BENCH_BUDGET_S", "500"))
    for i, a in enumerate(argv):
        if a == "--size":
            size = int(argv[i + 1])
        if a == "--minlen":
            minlen = int(argv[i + 1])
        if a == "--budget":
            budget = float(argv[i + 1])
    if "--all" in argv and "--budget" not in argv:
        budget = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    _DEADLINE = _T0 + budget

    if calibrate:
        import jax

        jax.config.update("jax_platforms", "cpu")

    hb("jax init: importing + first device contact")
    import jax

    dev = jax.devices()[0]
    hb(f"jax init: devices -> {dev}")
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros((8,), jnp.int32) + 1)
    hb("jax init: first dispatch+fetch done")

    if "--all" in argv:
        # record every scenario (headline config #1, multi-strain config #2,
        # MAM config #3, chr21 config #4, chr1-scale config #5 replicated +
        # TRUE sharded, throughput mode, rank kernel, stage budget) into
        # BENCH_DETAIL.json; stdout still gets ONE line (the headline).
        # Scenarios are isolated: device caches are cleared between them so
        # chr1's multi-GB tables never OOM a later scenario (VERDICT r3
        # missing #3). Errors are CLASSIFIED (VERDICT r4 #2b): tunnel/
        # remote-compile failures are environmental and retried once; the
        # artifact carries a top-level `errors` summary a commit message
        # can honestly quote (empty == genuinely zero errors, including
        # per-variant sub-errors like the rank kernel's).
        import subprocess

        errors: list[dict] = []

        def isolated(name, fn, *a, **kw):
            return isolated_scenario(name, fn, errors, *a, **kw)

        detail = {"headline_5mbp_l20": isolated("headline", run_bench,
                                                SIZE, MINLEN)}
        for key, fn, a in (
                ("chr21_40mbp_l50", run_bench, (40_000_000, 50)),
                ("config2_10strains_l30", run_config2_bench, ()),
                ("config3_mam_l20", run_mam_bench, ()),
                ("throughput_50mbp_l20", run_throughput_bench, ()),
                ("rank_kernel", run_rank_bench, ()),
                ("stages_5mbp_l20", run_stage_bench, ()),
                ("chr1_250mbp_l50", run_chr1_bench, ())):
            hb(f"scenario: {key}")
            detail[key] = isolated(key, fn, *a)
        # the chr1 scenario times the TRUE sharded program on the same
        # index build; surface it as its own artifact row (config #5's
        # "sharded index" — VERDICT r4 #1)
        chr1 = detail.get("chr1_250mbp_l50") or {}
        if "sharded" in chr1:
            detail["chr1_sharded_250mbp_l50"] = chr1.pop("sharded")
        # per-variant sub-errors (e.g. rank kernel variants) count too
        for key, res in detail.items():
            if isinstance(res, dict):
                for sub, val in res.items():
                    if sub.endswith("_error") and not any(
                            e.get("scenario") == f"{key}.{sub}"
                            for e in errors):
                        errors.append({"scenario": f"{key}.{sub}",
                                       "class": classify_error(str(val)),
                                       "error": str(val)[:300]})
        try:
            rev = subprocess.run(["git", "-C", HERE, "rev-parse",
                                  "--short", "HEAD"], capture_output=True,
                                 text=True).stdout.strip()
        except OSError:
            rev = None
        detail["errors"] = errors
        detail["_meta"] = {"generated_unix": int(time.time()),
                           "git_rev": rev,
                           "elapsed_s": round(time.perf_counter() - _T0, 1)}
        with open(os.path.join(HERE, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1, default=str)
            f.write("\n")
        res = detail["headline_5mbp_l20"]
        if "error" in res:
            print(json.dumps({"metric": "query_mbp_per_s_per_chip",
                              "value": None, "unit": "Mbp/s",
                              "vs_baseline": None,
                              "error": res["error"]}))
            return 1
        emit_headline(res)
        return 0

    if "--stages" in argv:  # stage budget of the fused path (VERDICT r2 #2)
        res = run_stage_bench(size, minlen)
        print(json.dumps({
            "metric": "headline_stage_budget_mbp_per_s",
            "value": round(res["mbp_per_s"], 3),
            "unit": "Mbp/s",
            "vs_baseline": None,
        }))
        print(json.dumps(res, default=str), file=sys.stderr)
        return 0

    if "--rank" in argv:  # rank/occ kernel roofline (BASELINE north star)
        res = run_rank_bench()
        print(json.dumps({
            "metric": "rank_kernel_gb_per_s",
            "value": round(res["rank_gb_per_s"], 1),
            "unit": "GB/s",
            "vs_baseline": round(res["hbm_fraction"], 4),
        }))
        print(json.dumps({"detail": {k: (round(v, 4) if isinstance(v, float)
                                         else v) for k, v in res.items()}}),
              file=sys.stderr)
        return 0

    if "--throughput" in argv:  # joined-dispatch serving mode (VERDICT #6)
        res = run_throughput_bench()
        print(json.dumps({
            "metric": "throughput_joined_mbp_per_s",
            "value": round(res["mbp_per_s"], 3),
            "unit": "Mbp/s",
            "vs_baseline": None,
        }))
        print(json.dumps({"detail": {k: (round(v, 4) if isinstance(v, float)
                                         else v) for k, v in res.items()}}),
              file=sys.stderr)
        return 0

    res = run_bench(size, minlen)

    if calibrate:
        payload = {
            "cpu_single_thread_mbp_per_s": res["mbp_per_s"],
            "provenance": "same engine, jax CPU backend, pin with "
                          "`taskset -c 0 python bench.py --calibrate`",
            "size": size,
            "minlen": minlen,
            "query_s": res["query_s"],
            "device": res["device"],
        }
        with open(BASELINE_FILE, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(json.dumps({"metric": "cpu_baseline_mbp_per_s",
                          "value": round(res["mbp_per_s"], 3),
                          "unit": "Mbp/s", "vs_baseline": 1.0}))
        return 0

    emit_headline(res, official=(size == SIZE and minlen == MINLEN))
    print(json.dumps({"detail": {k: (round(v, 4) if isinstance(v, float)
                                     else v) for k, v in res.items()}}),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
