#!/usr/bin/env python
"""Headline benchmark: query Mbp/s per chip (BASELINE.json metric).

Scenario: synthetic E. coli-scale strain pair (5 Mbp, ~1.5% SNPs + indels —
matched statistics for BASELINE config #1; real FASTA not provisioned in this
sandbox, SURVEY.md §6), MEM mode, -l 20. The timed region is the full query
phase (seed search, pair expansion, sort, run extraction and merge), index
build excluded — the index is a reusable checkpoint (SURVEY.md §5).

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

SIZE = 5_000_000
MINLEN = 20
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def build_inputs(size: int):
    from slamem_tpu.utils.synth import strain_pair

    return strain_pair(size, seed=20260816, sub_rate=0.015, indel_rate=0.0015)


def run_bench(size: int, minlen: int, repeats: int = 3) -> dict:
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.log import V5E_HBM_GBPS

    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    t_build = time.perf_counter() - t0

    # warmup (compiles + cache)
    m = find_seed_matches(index, qry, cfg)
    n_matches = int(m.length.size)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        times.append(time.perf_counter() - t0)
    t_query = min(times)
    res = {
        "mbp_per_s": (len(qry) / 1e6) / t_query,
        "query_s": t_query,
        "build_s": t_build,
        "matches": n_matches,
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
                      minlen: int = 30, repeats: int = 2) -> dict:
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
    index = build_index(rtext, cfg.occ_block)
    jax.block_until_ready(index.sa)
    out = run_engine(ref_set, qry_set, cfg, index=index)  # warmup/compiles
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run_engine(ref_set, qry_set, cfg, index=index)
        times.append(time.perf_counter() - t0)
    dt = min(times)
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
                   minlen: int = 50, repeats: int = 3) -> dict:
    """BASELINE config #5 stand-in: chr1-scale pair (250 Mbp reference,
    50 Mbp query slice, dissimilar-genome mutation rates). On one chip the
    sharded path delegates to the fused replicated engine (DESIGN.md §5c);
    multi-chip slab sharding is exercised on the fake mesh in tests."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(size, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:query_bp]
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    t_build = time.perf_counter() - t0
    cfg = Config(min_length=minlen)
    m = find_seed_matches(index, qry, cfg)  # warmup + adaptive sizing
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        times.append(time.perf_counter() - t0)
    dt = min(times)
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
    return res


def run_mam_bench(size: int = 5_000_000, minlen: int = 20,
                  repeats: int = 2) -> dict:
    """BASELINE config #3: MAM (reference-unique) mode on the E. coli pair.

    Uniqueness is decided from the match set alone (run-containment,
    apply_mode_filter), so MAM rides the same fused sparse-seeded fast
    path as MEM plus one vectorized host filter.
    """
    import jax

    from slamem_tpu.config import Config, MatchMode
    from slamem_tpu.engine.seed_mode import apply_mode_filter, \
        find_seed_matches
    from slamem_tpu.index.build import build_index

    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen, mode=MatchMode.MAM)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    m = apply_mode_filter(find_seed_matches(index, qry, cfg), cfg)  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = apply_mode_filter(find_seed_matches(index, qry, cfg), cfg)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "mbp_per_s": len(qry) / 1e6 / dt,
        "query_s": dt,
        "matches": int(m.length.size),
        "device": str(jax.devices()[0]),
    }


def run_stage_bench(size: int = SIZE, minlen: int = MINLEN,
                    repeats: int = 3) -> dict:
    """Device-synced stage budget of the headline fused path.

    Reproduces find_seed_matches' single-dispatch plan and grounds each
    stage on a host fetch (block_until_ready is unreliable on the axon
    tunnel — see .claude/skills/verify): round-trip latency, query upload,
    frontend-only dispatch, full fused dispatch, wire fetch, host decode,
    and the end-to-end engine call they add up to. This is the evidence
    VERDICT r2 asked for: with the byte floor at ~19 MB and the wall at
    ~130 ms, the next 2-3x lives in fixed costs, so name them.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index

    ref, qry = build_inputs(size)
    cfg = Config(min_length=minlen)
    index = build_index(ref)
    jax.block_until_ready(index.sa)

    def best(fn, n=repeats):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # converge adaptive capacities + compile everything (2 calls: first
    # observes counts, second runs the snapped shapes)
    m = sm.find_seed_matches(index, qry, cfg)
    m = sm.find_seed_matches(index, qry, cfg)
    t_end_to_end = best(lambda: sm.find_seed_matches(index, qry, cfg))

    # reproduce the engine's plan at the converged state
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index) if stride != 1 else None
    cap_cfg = int(cfg.pair_capacity)
    last_pairs, last_runs, last_kept = sm._last_total(index, k, stride)
    capacity, run_cap = cap_cfg, max(4096, cap_cfg // 16)
    if (last_pairs and cap_cfg >= sm._GROWTH_MIN_CAPACITY
            and last_runs is not None):
        capacity = sm.capacity_bucket(
            last_pairs, 1 << 18, max(cap_cfg, int(cfg.pair_capacity_max)))
        run_cap = sm.capacity_bucket(
            last_runs, 1 << 12, max(cap_cfg, int(cfg.pair_capacity_max)) // 8)
    kept_cap = run_cap
    if last_kept is not None:
        kept_cap = min(run_cap,
                       sm.capacity_bucket(last_kept, 1 << 12, run_cap))
    # reproduce the split-expansion plan (exact residual from the wire)
    m_s_plan = -(-m_p // stride)
    last_nz = sm._last_nonzero(index, k, stride)
    split = None
    if cfg.match_backend == "sort" and last_pairs and last_nz is not None:
        resid_est = max(0, last_pairs - last_nz)
        resid_floor = max(1024, min(1 << 16, capacity // 8))
        if 2 * resid_est <= max(resid_floor, capacity // 2):
            resid = sm.capacity_bucket(max(2 * resid_est, resid_floor),
                                       resid_floor,
                                       max(resid_floor, capacity // 2))
            split = (min(resid, m_s_plan), resid)
    m_s = m_p // stride
    use_bucket = cfg.frontend == "bucket"
    probes = 12
    if cfg.frontend == "auto" and index.n >= 4 * m_s:
        starts, shift, probes = sm.bucket_table(index, k)
        use_bucket = sm.prefer_bucket(index.n, m_s, len(refk), probes)
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
                kept_capacity=kept_cap, minlen=minl, split=split)
        else:
            out = sm.fused_query(
                index.text, refk, sa_aug, qt, k, capacity, run_cap,
                cfg.match_backend, stride, ext_r,
                kept_capacity=kept_cap, minlen=minl, split=split)
        state["packed"] = out[4]
        np.asarray(out[3])
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
        "plan": {"k": k, "stride": stride, "bucket": use_bucket,
                 "probes": probes, "capacity": capacity,
                 "run_cap": run_cap, "kept_cap": kept_cap,
                 "wire_bytes": int(wire.nbytes), "n_kept": n_kept,
                 "m_padded": m_p},
        "device": str(jax.devices()[0]),
    }


def run_rank_bench(size: int = 5_000_000, batch: int = 1 << 22,
                   repeats: int = 3) -> dict:
    """Rank/occ roofline: one 512 B interleaved row per query.

    Device-resident timing (VERDICT r2 weak #7): the batch is consumed
    with .sum() and only that scalar crosses the tunnel, so the recorded
    GB/s measures the kernel, not the ~24 ms/fetch + 16 ms/MB wire. Times
    the nibble-SWAR XLA path (the production default), the Pallas DMA
    kernel and the byte-unpack XLA path for the record.
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
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    rows_n = nibble_rows(index)
    rows_w = nibble_rows(index, 512)  # 2 KB rows: the bandwidth point
    rows_b = interleaved_rows(index)
    rng = np.random.default_rng(20260817)
    chars = jnp.asarray(rng.integers(0, 4, size=batch).astype(np.int32))
    pos = jnp.asarray(
        rng.integers(0, index.n + 1, size=batch).astype(np.int32))
    nv = 8192
    want = np.asarray(rank_batch(index, chars[:nv], pos[:nv]))
    got = np.asarray(rank_rows_nib(rows_n, chars[:nv], pos[:nv]))
    got_w = np.asarray(rank_rows_nib(rows_w, chars[:nv], pos[:nv]))
    equal = bool(np.array_equal(want, got) and np.array_equal(want, got_w))

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
    out = {}
    for name, (row_bytes, fn) in variants.items():
        try:
            np.asarray(fn(chars, pos))  # compile + warm
        except Exception as e:  # e.g. Pallas compiled mode off-TPU
            out[name + "_error"] = str(e)[:120]
            continue
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(chars, pos))
            times.append(time.perf_counter() - t0)
        out[name + "_s"] = min(times)
        out[name + "_ns_per_query"] = min(times) / batch * 1e9
        out[name + "_gb_per_s"] = batch * row_bytes / min(times) / 1e9
    gbps = out.get("nibble_2kb_gb_per_s",
                   out.get("nibble_swar_gb_per_s", 0.0))
    return {
        "rank_gb_per_s": gbps,  # bandwidth point: 2 KB rows
        "hbm_fraction": gbps / V5E_HBM_GBPS,
        "queries": batch,
        "equal_vs_rank_batch": equal,
        "device": str(jax.devices()[0]),
        **out,
    }


def main() -> int:
    argv = sys.argv[1:]
    calibrate = "--calibrate" in argv
    size = SIZE
    minlen = MINLEN
    if "--quick" in argv:
        size = 1_000_000
    if "--chr21" in argv:  # config #4 stand-in: chr21-scale pair, -l 50
        size = 40_000_000
        minlen = 50
    for i, a in enumerate(argv):
        if a == "--size":
            size = int(argv[i + 1])
        if a == "--minlen":
            minlen = int(argv[i + 1])

    if calibrate:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if "--all" in argv:
        # record every scenario (headline config #1, multi-strain config #2,
        # chr21 config #4, chr1-scale config #5, rank kernel) into
        # BENCH_DETAIL.json; stdout still gets ONE line (the headline)
        detail = {"headline_5mbp_l20": run_bench(SIZE, MINLEN)}
        detail["chr21_40mbp_l50"] = run_bench(40_000_000, 50, repeats=2)
        for key, fn in (("config2_10strains_l30", run_config2_bench),
                        ("config3_mam_l20", run_mam_bench),
                        ("chr1_250mbp_l50", run_chr1_bench),
                        ("rank_kernel", run_rank_bench),
                        ("stages_5mbp_l20", run_stage_bench)):
            try:
                detail[key] = fn()
            except Exception as e:  # no scenario may mask the headline
                detail[key] = {"error": str(e)[:300]}
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1, default=str)
        res = detail["headline_5mbp_l20"]
        vs = None
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                base = json.load(f)["cpu_single_thread_mbp_per_s"]
            vs = res["mbp_per_s"] / base if base > 0 else None
        print(json.dumps({
            "metric": "query_mbp_per_s_per_chip",
            "value": round(res["mbp_per_s"], 3),
            "unit": "Mbp/s",
            "vs_baseline": round(vs, 3) if vs is not None else None,
        }))
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

    if "--rank" in argv:  # Pallas occ kernel roofline (BASELINE north star)
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
        print(json.dumps({"metric": "cpu_baseline_mbp_per_s",
                          "value": round(res["mbp_per_s"], 3),
                          "unit": "Mbp/s", "vs_baseline": 1.0}))
        return 0

    vs = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["cpu_single_thread_mbp_per_s"]
        vs = res["mbp_per_s"] / base if base > 0 else None
    print(json.dumps({
        "metric": "query_mbp_per_s_per_chip",
        "value": round(res["mbp_per_s"], 3),
        "unit": "Mbp/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))
    print(json.dumps({"detail": {k: (round(v, 4) if isinstance(v, float)
                                     else v) for k, v in res.items()}}),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
