#!/usr/bin/env python
"""One-at-a-time TPU experiment battery (run under `timeout`, single process).

Each subcommand is one tunnel-friendly experiment; results print as JSON
lines. Usage: python scripts/tpu_experiments.py <name>

  headline      5 Mbp -l 20 seed-engine regression check
  rank          compiled rank kernel equivalence + GB/s
  chr21ab       chr21-scale A/B: K=16 vs K=32 seed depth
  scan          scan engine compiled on TPU (small, then 1 Mbp)
  chr1          chr1-scale sharded rehearsal (250 Mbp ref, 50 Mbp query)
  chr1rep       replicated chr1: 4 consecutive calls (compile-shape anomaly)
  capab/hlprof/profscale/packprof/tailprof/splitprof  stage cost batteries
  seedk_headline / chr21k / chr21k13   seed-depth policy sweeps
  rankx / rankc / rankc2   rank-kernel redesign + honest-HBM concurrency
  splitprof2    top_k vs compaction split selection (+ headline check)
  saprobe       fused (starts, sa0) gather lowering A/B (negative result)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def _bench_query(index, qry, cfg, repeats=2):
    from slamem_tpu.engine.seed_mode import find_seed_matches

    m = find_seed_matches(index, qry, cfg)  # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        times.append(time.perf_counter() - t0)
    return min(times), m


def headline():
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    t_build = time.perf_counter() - t0
    dt, m = _bench_query(index, qry, Config(min_length=20), repeats=3)
    print(json.dumps({"exp": "headline", "mbp_per_s": len(qry) / 1e6 / dt,
                      "query_s": dt, "build_s": t_build,
                      "matches": int(m.length.size), "stats": m.stats}))


def capab():
    """Headline vs pair_capacity: how much of the fused dispatch scales
    with the static buffer width (sort rows, boundary gathers, cumsums)
    rather than the actual 3.8M pairs."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    for cap in (1 << 23, 6 << 20, 1 << 22):
        dt, m = _bench_query(index, qry,
                             Config(min_length=20, pair_capacity=cap),
                             repeats=3)
        print(json.dumps({"exp": "capab", "capacity": cap,
                          "mbp_per_s": len(qry) / 1e6 / dt, "query_s": dt,
                          "matches": int(m.length.size),
                          "pairs": m.stats["pairs"] if m.stats else None}))
        sys.stdout.flush()


def sortshape():
    """Does partitioning a big 2-col sort into key-range slabs pay?

    Bitonic work per element is ~log^2(rows); a (B, rows/B) batched sort
    should cut the depth if XLA maps it well. Times flat vs batched shapes
    at the chr21 join size (80M rows), plus the query-only size (40M)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    n = 1 << 26  # 67M ~ chr21 join scale

    @functools.cache
    def _sorter(shape):
        def f(a, b):
            sa, sb = jax.lax.sort((a, b), dimension=-1, num_keys=2)
            return sa[..., -1], sb[..., -1]
        return jax.jit(f)

    a = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32)
    b = jnp.arange(n, dtype=jnp.int32)
    for shape in ((n,), (n // 2,), (16, n // 16), (64, n // 64),
                  (256, n // 256)):
        rows = shape[-1]
        av = a[:np.prod(shape)].reshape(shape)
        bv = b[:np.prod(shape)].reshape(shape)
        f = _sorter(shape)
        np.asarray(f(av, bv)[0])  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(av, bv)[0])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "sortshape", "shape": list(shape),
                          "rows": int(np.prod(shape)), "s": best,
                          "ns_per_row_col": best / np.prod(shape) / 2 * 1e9}))
        sys.stdout.flush()


def rank():
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels.rank import rank_pallas
    from slamem_tpu.utils.synth import random_genome, with_n_runs

    rng = np.random.default_rng(150)
    t = with_n_runs(random_genome(5_000_000, seed=151), 3, 40, seed=152)
    t0 = time.perf_counter()
    idx = build_index(t)
    print(json.dumps({"exp": "rank", "step": "index",
                      "s": time.perf_counter() - t0}))
    sys.stdout.flush()
    # small batch first: compile at a cheap shape, verify, then scale
    for b in (1 << 13, 1 << 17, 1 << 20):
        chars = jnp.asarray(rng.integers(0, 4, size=b).astype(np.int32))
        pos = jnp.asarray(
            rng.integers(0, idx.n + 1, size=b).astype(np.int32))
        t0 = time.perf_counter()
        got = np.asarray(rank_pallas(idx, chars, pos))
        first = time.perf_counter() - t0
        nv = min(b, 8192)
        want = np.asarray(rank_batch(idx, chars[:nv], pos[:nv]))
        equal = bool(np.array_equal(got[:nv], want))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(rank_pallas(idx, chars, pos))
            best = min(best, time.perf_counter() - t0)
        gbps = b * 512 / best / 1e9
        print(json.dumps({"exp": "rank", "batch": b, "equal": equal,
                          "first_s": first, "best_s": best,
                          "gb_per_s": gbps, "hbm_fraction": gbps / 819.0}))
        sys.stdout.flush()


def chr21ab():
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(40_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "chr21ab", "build_s": time.perf_counter() - t0}))
    orig = seed_mode.choose_seed_k
    variants = [(16, "join"), (16, "bucket"), (32, "join"), (32, "bucket")]
    if len(sys.argv) > 2:  # e.g. `chr21ab 32:bucket` runs one variant
        ks, fr = sys.argv[2].split(":")
        variants = [(int(ks), fr)]
    for forced_k, frontend in variants:
        seed_mode.choose_seed_k = lambda n, m, L, cap, _k=forced_k: _k
        try:
            dt, m = _bench_query(index, qry,
                                 Config(min_length=50, frontend=frontend))
        finally:
            seed_mode.choose_seed_k = orig
        print(json.dumps({"exp": "chr21ab", "k": forced_k,
                          "frontend": frontend,
                          "mbp_per_s": len(qry) / 1e6 / dt, "query_s": dt,
                          "matches": int(m.length.size), "stats": m.stats}))
        sys.stdout.flush()


def chr21prof():
    """Phase breakdown of the chr21 query: frontend vs expansion."""
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(40_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=50)
    k = 16
    qp = seed_mode.pad_query(qry)
    m_p = int(qp.shape[0])
    refk, sa_aug = seed_mode.seed_table(index, k)
    qt = jnp.asarray(qp)
    jax.block_until_ready(refk[0])

    def timed(label, fn, n=2):
        best = 1e9
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "chr21prof", "phase": label, "s": best}))
        sys.stdout.flush()
        return out

    # packing alone
    timed("pack", lambda: np.asarray(
        seed_mode.packed_key_words(qt, k)[0][0][:8]))
    # frontend join (fused pack+join+cumsum), fetch summary only
    lo, width, cum, summary = None, None, None, None

    def _front():
        nonlocal lo, width, cum, summary
        lo, width, cum, summary = seed_mode.query_frontend(refk, qt, k)
        return np.asarray(summary)

    sm = timed("frontend_join", _front)
    print(json.dumps({"exp": "chr21prof", "pairs": int(sm[0]),
                      "max_w": int(sm[1])}))
    # expansion+sort+compact at 32M capacity, single block
    capacity = 1 << 25
    run_cap = max(4096, capacity // 16)
    block = min(cfg.position_block, m_p)
    lo_ext = jnp.concatenate([lo, jnp.zeros((block,), lo.dtype)])
    w_ext = jnp.concatenate([width, jnp.zeros((block,), width.dtype)])
    m_off32 = jnp.asarray((m_p + block + 2) // 2, jnp.int32)
    timed("expand_runs_32M", lambda: np.asarray(
        seed_mode.expand_block_to_runs(
            sa_aug, lo_ext, w_ext, jnp.asarray(0, jnp.int64),
            jnp.asarray(m_p, jnp.int64), m_off32, capacity, run_cap,
            block)[3]))


def scan():
    from slamem_tpu.config import Config
    from slamem_tpu.engine.scan_mode import find_scan_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import mutate, random_genome

    for size, rk in ((20_000, "xla"), (20_000, "pallas"),
                     (1_000_000, "pallas")):
        ref = random_genome(size, seed=61)
        qry = mutate(ref, 0.02, 0.002, seed=62)
        index = build_index(ref)
        cfg = Config(min_length=20, engine="scan", rank_kernel=rk)
        t0 = time.perf_counter()
        m = find_scan_matches(index, qry, cfg)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        m = find_scan_matches(index, qry, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "scan", "size": size, "rank_kernel": rk,
                          "first_s": first, "query_s": dt,
                          "mbp_per_s": len(qry) / 1e6 / dt,
                          "matches": int(m.length.size)}))
        sys.stdout.flush()


def chr1front():
    """Isolate the replicated chr1 anomaly: frontend vs fused tail.

    chr1 (r2, sparse): sharded 5.6 s but REPLICATED 56 s at 1.07M pairs —
    10x apart on near-identical work. Times the bucket and join frontends
    alone, then the fused variants, 250 Mbp ref / 50 Mbp query, stride 16."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(250_000_000, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:50_000_000]
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "chr1front",
                      "build_s": time.perf_counter() - t0}))
    sys.stdout.flush()
    k = 32
    stride = 16
    refk, sa_aug = sm.seed_table(index, k)
    qp, qt = sm.query_to_device(qry)
    starts, shift, probes = sm.bucket_table(index, k)

    def timed(label, fn, n=2):
        fn()  # compile
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "chr1front", "label": label, "s": best}))
        sys.stdout.flush()

    timed("frontend_bucket", lambda: np.asarray(sm.query_frontend_bucket(
        refk, starts, qt, k, shift, probes, stride)[3]))
    timed("frontend_join", lambda: np.asarray(sm.query_frontend(
        refk, qt, k, stride)[3]))
    ext_r = sm.ext_table(index)
    cap = 1 << 21
    timed("fused_bucket", lambda: np.asarray(sm.fused_query_bucket(
        index.text, refk, starts, sa_aug, qt, k, cap, cap // 16,
        shift, probes, "sort", stride, ext_r)[3][-3:]))
    timed("fused_join", lambda: np.asarray(sm.fused_query(
        index.text, refk, sa_aug, qt, k, cap, cap // 16,
        "sort", stride, ext_r)[3][-3:]))


def chr1():
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist.sharded import find_seed_matches_sharded
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(250_000_000, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:50_000_000]
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    build_s = time.perf_counter() - t0
    print(json.dumps({"exp": "chr1", "build_s": build_s}))
    sys.stdout.flush()
    mesh = make_mesh(len(jax.devices()))
    cfg = Config(min_length=50)
    t0 = time.perf_counter()
    m = find_seed_matches_sharded(index, qry, cfg, mesh)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    m = find_seed_matches_sharded(index, qry, cfg, mesh)
    dt = time.perf_counter() - t0
    print(json.dumps({"exp": "chr1", "path": "sharded", "first_s": first,
                      "query_s": dt, "mbp_per_s": len(qry) / 1e6 / dt,
                      "matches": int(m.length.size)}))
    sys.stdout.flush()
    from slamem_tpu.engine.seed_mode import find_seed_matches

    t0 = time.perf_counter()
    m2 = find_seed_matches(index, qry, cfg)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    m2 = find_seed_matches(index, qry, cfg)
    dt = time.perf_counter() - t0
    print(json.dumps({"exp": "chr1", "path": "replicated", "first_s": first,
                      "query_s": dt, "mbp_per_s": len(qry) / 1e6 / dt,
                      "matches": int(m2.length.size), "stats": m2.stats,
                      "equal_sharded": int(m.length.size) == int(m2.length.size)}))




def wire():
    """Tunnel transfer economics: RTT floor, fetch bandwidth, and the
    headline fused-query wire cost (full packed fetch vs 1-element ground).

    Decides whether shrinking the run-triple payload (3*run_cap+3 int32,
    3.1 MB at the default 4M capacity) is the next headline lever."""
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    # fetch bandwidth ladder
    for nbytes in (4, 1 << 12, 1 << 17, 1 << 20, 1 << 22, 1 << 24):
        x = jnp.zeros((nbytes // 4,), jnp.int32) + 1
        np.asarray(x[:1])  # materialize
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "wire", "fetch_bytes": nbytes, "s": best,
                          "mb_per_s": nbytes / 1e6 / best}))
        sys.stdout.flush()

    # headline fused query: ground with 1-element fetch vs full wire
    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=20)
    qp = seed_mode.pad_query(qry)
    qt = jnp.asarray(qp)
    k = seed_mode.choose_seed_k(index.n, qp.shape[0], 20, 32)
    refk, sa_aug = seed_mode.seed_table(index, k)
    capacity = int(cfg.pair_capacity)
    run_cap = max(4096, capacity // 16)
    out = seed_mode.fused_query(index.text, refk, sa_aug, qt, k, capacity,
                                run_cap, "sort")
    np.asarray(out[3][:1])  # warm
    n_runs = int(np.asarray(out[3][3 * run_cap]))
    for label, fetch in (("ground_1elem", lambda o: np.asarray(o[3][:1])),
                         ("full_wire", lambda o: np.asarray(o[3]))):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = seed_mode.fused_query(index.text, refk, sa_aug, qt, k,
                                        capacity, run_cap, "sort")
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "wire", "phase": label, "s": best,
                          "wire_ints": 3 * run_cap + 3,
                          "n_runs": n_runs}))
        sys.stdout.flush()


def prof2():
    """Micro-profile expansion primitives at 32M on the chip.

    All arrays are passed as jit ARGUMENTS — closed-over device arrays get
    embedded as HLO constants, and 160 MB constants blow the tunneled
    remote-compile request limit (HTTP 413, round-2 session 1)."""
    import jax
    import jax.numpy as jnp

    C = 1 << 25           # capacity
    M = 40_000_000        # positions
    N = 40_000_000        # table rows
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.random(M) < 0.78).astype(np.int32))
    sa = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    text = jnp.asarray(rng.integers(0, 4, N).astype(np.uint8))
    idx32 = jnp.asarray(rng.integers(0, N, C).astype(np.int32))
    keys = jnp.asarray(rng.integers(0, 2**31 - 1, C).astype(np.int32))
    keys2 = jnp.asarray(rng.integers(0, 2**31 - 1, C).astype(np.int32))

    def ground(x):
        # block_until_ready does NOT wait under the axon tunnel; a 1-element
        # fetch has a data dependency on the whole result and does
        while isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x[:1])

    def timed(label, fn, *args, n=2):
        ground(fn(*args))  # compile+warm
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            ground(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "prof2", "op": label, "s": best}))
        sys.stdout.flush()

    ends = jnp.cumsum(w)

    @jax.jit
    def marks_scatter(ends, w):
        base = ends - w
        marks = jnp.zeros((C,), jnp.int32).at[
            jnp.clip(base, max=C)].max(
                jnp.arange(M, dtype=jnp.int32) + 1, mode="drop")
        return jax.lax.cummax(marks)

    timed("marks_scatter+cummax", marks_scatter, ends, w)
    timed("gather_4B_32M", jax.jit(lambda sa, i: sa[i]), sa, idx32)
    timed("gather_1B_32M", jax.jit(lambda t, i: t[i]), text, idx32)
    timed("cumsum_32M", jax.jit(jnp.cumsum), keys)
    timed("cumsum_40M", jax.jit(jnp.cumsum), w)
    timed("sort_2col_32M",
          jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=0, num_keys=2)),
          keys, keys2)

    @jax.jit
    def sort3_join(a, b):
        # join-frontend shape: (n + m) rows, 2 key cols + tag col
        k0 = jnp.concatenate([a, b, a, b])[:M * 2]
        k1 = jnp.concatenate([b, a, b, a])[:M * 2]
        tag = jnp.arange(M * 2, dtype=jnp.int32)
        return jax.lax.sort((k0, k1, tag), dimension=0, num_keys=3)

    timed("sort_3col_80M_join", sort3_join, keys, keys2)

    @jax.jit
    def scatter_small(keys):
        sidx = (jnp.cumsum((keys & 15) == 0) - 1).astype(jnp.int32)
        drop = jnp.int32(C // 16)
        return jnp.full((C // 16,), -1, jnp.int32).at[
            jnp.where((keys & 15) == 0, sidx, drop)].set(keys, mode="drop")

    timed("flagscan+scatter_2M", scatter_small, keys)


def prof3():
    """Isolate the seg-id machinery's pieces and try cheaper formulations.

    Question set (engine/seed_mode.py _expand_seg): of scatter-max + cummax
    + one monotone block gather, which op carries the ~0.5 s at 32M — and do
    scatter-add + cumsum (count fill) or delta-scatter + cumsum (value fill,
    replacing the gather entirely) beat it?
    """
    import jax
    import jax.numpy as jnp

    C = 1 << 25           # capacity slots
    M = 40_000_000        # segments (positions)
    rng = np.random.default_rng(1)
    w = jnp.asarray((rng.random(M) < 0.78).astype(np.int32))
    vals = jnp.asarray(rng.integers(-2**30, 2**30, M).astype(np.int32))
    segc = jnp.asarray(np.minimum(
        np.sort(rng.integers(0, M, C)).astype(np.int32), M - 1))

    def ground(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x[:1])

    def timed(label, fn, *args, n=2):
        ground(fn(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            ground(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "prof3", "op": label, "s": best}))
        sys.stdout.flush()

    @jax.jit
    def base_of(w):
        ends = jnp.cumsum(w)
        return ends - w

    @jax.jit
    def scatter_max_only(w):
        base = base_of(w)
        return jnp.zeros((C,), jnp.int32).at[
            jnp.clip(base, max=C)].max(
                jnp.arange(M, dtype=jnp.int32) + 1, mode="drop")

    @jax.jit
    def scatter_add_only(w):
        base = base_of(w)
        return jnp.zeros((C,), jnp.int32).at[
            jnp.clip(base, max=C)].add(1, mode="drop")

    timed("cummax_32M", jax.jit(jax.lax.cummax), segc)
    timed("scatter_max_40Mto32M", scatter_max_only, w)
    timed("scatter_add_40Mto32M", scatter_add_only, w)
    timed("segc_max_cummax", jax.jit(
        lambda w: jax.lax.cummax(scatter_max_only(w))), w)
    timed("segc_add_cumsum", jax.jit(
        lambda w: jnp.cumsum(scatter_add_only(w))), w)
    timed("gather_monotone_32M", jax.jit(lambda v, i: v[i]), vals, segc)

    @jax.jit
    def delta_fill(vals, w):
        # per-slot vals[seg] with NO gather: scatter value deltas at bases
        # (duplicates telescope under add), then cumsum
        base = base_of(w)
        dv = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        acc = jnp.zeros((C,), jnp.int32).at[
            jnp.clip(base, max=C)].add(dv, mode="drop")
        return jnp.cumsum(acc)

    timed("delta_fill_vals", delta_fill, vals, w)




def chr1rep():
    """Replicated chr1 anomaly, take 2: time FOUR consecutive production
    calls. Hypothesis: call 2's 56 s was the fresh XLA compile of the
    adaptive-capacity fused shape (call 1 runs the default 4M capacity,
    overflows its run buffer, records (pairs, runs); call 2 snaps to the
    6M bucket -- a shape never compiled before). If so, calls 3+ drop to
    the ~1.7 s the isolated fused_bucket measurement showed."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(250_000_000, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:50_000_000]
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "chr1rep",
                      "build_s": time.perf_counter() - t0}))
    sys.stdout.flush()
    cfg = Config(min_length=50)
    for call in range(4):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "chr1rep", "call": call, "s": dt,
                          "matches": int(m.length.size),
                          "stats": m.stats}))
        sys.stdout.flush()



def chr21sparse():
    """Stage-level profile of the CURRENT sparse chr21 query (40 Mbp,
    -l 50, stride 16, k 16): where do the 1.48 s go? Times the packing,
    the join frontend, the full fused dispatch at the adaptive capacity,
    and the wire fetch separately."""
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(40_000_000, seed=20260817, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=50)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k = sm.choose_seed_k(index.n, m_p, 50, cfg.seed_length_cap)
    stride = sm.choose_stride(k, 50)
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index)
    print(json.dumps({"exp": "chr21sparse", "k": k, "stride": stride,
                      "m_p": m_p, "n": int(index.n)}))
    sys.stdout.flush()

    def timed(label, fn, n=3):
        fn()
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "chr21sparse", "label": label, "s": best}))
        sys.stdout.flush()

    pack = jax.jit(lambda q: sm.packed_key_words(q, k)[0][0],
                   static_argnums=())
    timed("pack_all", lambda: jax.block_until_ready(pack(qt)))
    timed("frontend_join", lambda: np.asarray(
        sm.query_frontend(refk, qt, k, stride)[3]))
    starts, shift, probes = sm.bucket_table(index, k)
    print(json.dumps({"exp": "chr21sparse", "probes": probes}))
    timed("frontend_bucket", lambda: np.asarray(
        sm.query_frontend_bucket(refk, starts, qt, k, shift, probes,
                                 stride)[3]))
    # production calls to settle adaptive capacity, then the exact dispatch
    from slamem_tpu.engine.seed_mode import find_seed_matches
    for call in range(3):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "chr21sparse", "call": call, "s": dt,
                          "matches": int(m.length.size), "stats": m.stats}))
        sys.stdout.flush()
    last_pairs, last_runs, _kept = sm._last_total(index, k, stride)
    capacity = sm.capacity_bucket(max(last_pairs, 16 * (last_runs or 1)),
                                  1 << 18, int(cfg.pair_capacity_max))
    run_cap = max(4096, capacity // 16)
    print(json.dumps({"exp": "chr21sparse", "capacity": capacity,
                      "run_cap": run_cap}))
    timed("fused_dispatch_only", lambda: jax.block_until_ready(
        sm.fused_query(index.text, refk, sa_aug, qt, k, capacity, run_cap,
                       "sort", stride, ext_r)[3]))
    timed("fused_plus_wire", lambda: np.asarray(
        sm.fused_query(index.text, refk, sa_aug, qt, k, capacity, run_cap,
                       "sort", stride, ext_r)[3]))



def seedk_headline():
    """Headline K sweep: K < 16 trades bucket/join rows for noise pairs.

    At L=20 the stride bound S <= L-K+1 means K=12 still allows S=9
    (m_s = 555K vs 1M at K=16/S=5) and the K=12 noise term n*m_s/4^12 is
    only ~166K pairs at 5 Mbp — the frontend shrinks nearly 2x. Sweeps
    seed_length_cap over {16, 14, 13, 12}, 3 production calls each."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    for cap in (16, 14, 13, 12):
        cfg = Config(min_length=20, seed_length_cap=cap)
        find_seed_matches(index, qry, cfg)
        best = 1e9
        stats = None
        for _ in range(3):
            t0 = time.perf_counter()
            m = find_seed_matches(index, qry, cfg)
            dt = time.perf_counter() - t0
            if dt < best:
                best, stats = dt, m.stats
        print(json.dumps({"exp": "seedk_headline", "cap": cap, "s": best,
                          "mbp_per_s": len(qry) / 1e6 / best,
                          "matches": int(m.length.size), "stats": stats}))
        sys.stdout.flush()


def hlprof():
    """Stage-level profile of the headline query at the round-2 policy
    (5 Mbp, -l 20, K=14, stride 7): pack, frontend, fused dispatch alone,
    fused + wire fetch, full production call — where does the 0.2 s go?"""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=20)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k = sm.choose_seed_k_sparse(index.n, m_p, 20, cfg.seed_length_cap)
    stride = sm.choose_stride(k, 20)
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index)
    print(json.dumps({"exp": "hlprof", "k": k, "stride": stride,
                      "m_p": m_p, "n": int(index.n)}))
    sys.stdout.flush()

    def timed(label, fn, n=5):
        fn()
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "hlprof", "label": label, "s": best}))
        sys.stdout.flush()

    pack = jax.jit(lambda q: sm.packed_key_words(q, k)[0][0])
    timed("pack_all", lambda: jax.block_until_ready(pack(qt)))
    timed("frontend_join", lambda: np.asarray(
        sm.query_frontend(refk, qt, k, stride)[3]))
    starts, shift, probes = sm.bucket_table(index, k)
    print(json.dumps({"exp": "hlprof", "probes": probes}))
    timed("frontend_bucket", lambda: np.asarray(
        sm.query_frontend_bucket(refk, starts, qt, k, shift, probes,
                                 stride)[3]))
    for call in range(3):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "hlprof", "call": call, "s": dt,
                          "matches": int(m.length.size), "stats": m.stats}))
        sys.stdout.flush()
    last_pairs, last_runs, _kept = sm._last_total(index, k, stride)
    capacity = sm.capacity_bucket(last_pairs, 1 << 18,
                                  int(cfg.pair_capacity_max))
    run_cap = sm.capacity_bucket(last_runs or capacity // 16, 1 << 12,
                                 int(cfg.pair_capacity_max) // 8)
    use_bucket = sm.prefer_bucket(index.n, m_p // stride, len(refk), probes)
    print(json.dumps({"exp": "hlprof", "capacity": capacity,
                      "run_cap": run_cap, "use_bucket": bool(use_bucket)}))

    def dispatch():
        if use_bucket:
            return sm.fused_query_bucket(index.text, refk, starts, sa_aug,
                                         qt, k, capacity, run_cap, shift,
                                         probes, "sort", stride, ext_r)[3]
        return sm.fused_query(index.text, refk, sa_aug, qt, k, capacity,
                              run_cap, "sort", stride, ext_r)[3]

    timed("fused_dispatch_only", lambda: jax.block_until_ready(dispatch()))
    timed("fused_plus_wire", lambda: np.asarray(dispatch()))


def chr21k():
    """chr21-scale seed-cap sweep {16, 14, 13}: validates the round-2
    direct-addressed K=14 preference (DESIGN.md §5e) on the real chip."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(40_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    for cap in (16, 14, 13):
        cfg = Config(min_length=50, seed_length_cap=cap)
        find_seed_matches(index, qry, cfg)
        best, stats, m = 1e9, None, None
        for _ in range(3):
            t0 = time.perf_counter()
            m = find_seed_matches(index, qry, cfg)
            dt = time.perf_counter() - t0
            if dt < best:
                best, stats = dt, m.stats
        print(json.dumps({"exp": "chr21k", "cap": cap, "s": best,
                          "mbp_per_s": len(qry) / 1e6 / best,
                          "matches": int(m.length.size), "stats": stats}))
        sys.stdout.flush()


def profscale():
    """Stage profile of the production fused path at an arbitrary scale:
    `profscale <size_mbp> <minlen>` (defaults 40, 50 = the chr21 config).

    Times, device-grounded: the bucket frontend alone, the fused dispatch
    alone, dispatch + wire fetch, and the full production call — the same
    split hlprof gives the 5 Mbp headline, at whatever scale the next
    bottleneck hunt needs."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.engine.seed_mode import find_seed_matches
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    size = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 40_000_000
    minlen = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    ref, qry = strain_pair(size, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=minlen)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index) if stride != 1 else None
    starts, shift, probes = sm.bucket_table(index, k)
    print(json.dumps({"exp": "profscale", "size": size, "minlen": minlen,
                      "k": k, "stride": stride, "probes": probes,
                      "m_p": m_p}))
    sys.stdout.flush()

    def timed(label, fn, n=3):
        fn()
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"exp": "profscale", "label": label, "s": best}))
        sys.stdout.flush()

    pack = jax.jit(functools.partial(sm.sampled_query_keys, k=k,
                                     stride=stride))
    timed("pack_sampled", lambda: jax.block_until_ready(pack(qt)))
    front = jax.jit(functools.partial(
        sm.query_frontend_bucket, k=k, shift=shift, probes=probes,
        stride=stride))
    timed("frontend_bucket_dev", lambda: jax.block_until_ready(
        front(refk, starts, qt)[1]))
    for call in range(3):
        t0 = time.perf_counter()
        m = find_seed_matches(index, qry, cfg)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "profscale", "call": call, "s": dt,
                          "matches": int(m.length.size), "stats": m.stats}))
        sys.stdout.flush()
    last_pairs, last_runs, _kept = sm._last_total(index, k, stride)
    capacity = sm.capacity_bucket(last_pairs, 1 << 18,
                                  int(cfg.pair_capacity_max))
    run_cap = sm.capacity_bucket(last_runs or capacity // 16, 1 << 12,
                                 int(cfg.pair_capacity_max) // 8)
    print(json.dumps({"exp": "profscale", "capacity": capacity,
                      "run_cap": run_cap, "last_pairs": last_pairs,
                      "last_runs": last_runs}))

    def dispatch():
        return sm.fused_query_bucket(index.text, refk, starts, sa_aug, qt,
                                     k, capacity, run_cap, shift, probes,
                                     "sort", stride, ext_r)[3]

    timed("fused_dispatch_only", lambda: jax.block_until_ready(dispatch()))
    timed("fused_plus_wire", lambda: np.asarray(dispatch()))



def packprof():
    """Where do the frontend's 58 ms go (stage bench, 5 Mbp headline)?

    Times, device-grounded: full-position packing then [::S] (current
    sampled_query_keys), strided-slice packing at samples only, reshape-
    column packing at samples only, the bucket interval search alone, and
    the valid/cummin pass alone. Candidate replacements must match the
    current keys bit-exactly.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.io.fasta import CODE_N
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    cfg = Config(min_length=20)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)
    starts, shift, probes = sm.bucket_table(index, k)
    print(json.dumps({"exp": "packprof", "k": k, "stride": stride,
                      "m_padded": m_p, "probes": probes}))

    def timed(name, fn, repeats=3):
        fn()
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "packprof", "t": name, "s": min(ts)}))
        sys.stdout.flush()

    # current: pack every position, then slice
    @functools.partial(jax.jit, static_argnames=("k", "stride"))
    def cur(qt, k, stride):
        w, v = sm.packed_key_words(qt, k)
        return tuple(x[::stride] for x in w), v[::stride]

    # candidate A: strided slices of the padded text, samples only
    @functools.partial(jax.jit, static_argnames=("k", "stride"))
    def stridedpack(text, k, stride):
        n = text.shape[0]
        ns = -(-n // stride)
        pos = jnp.arange(n, dtype=jnp.int32)
        special_at = jnp.where(text >= CODE_N, pos, jnp.int32(n))
        next_special = jax.lax.cummin(special_at, reverse=True)
        s_pos = jnp.arange(ns, dtype=jnp.int32) * stride
        ns_s = next_special[::stride]
        padded = jnp.concatenate([text, jnp.zeros((k + stride,), jnp.uint8)])
        words = []
        for w0 in range(0, k, 16):
            acc = jnp.zeros((ns,), jnp.uint32)
            for t in range(w0, min(w0 + 16, k)):
                ch = jax.lax.slice(padded, (t,), (t + (ns - 1) * stride + 1,),
                                   (stride,)).astype(jnp.uint32)
                mask = s_pos + t < ns_s
                acc = acc * 4 + jnp.where(mask, ch, jnp.uint32(0))
            words.append(acc)
        valid = ns_s - s_pos >= k
        return tuple(words), valid

    # candidate B: reshape to (ns, stride) columns, samples only
    @functools.partial(jax.jit, static_argnames=("k", "stride"))
    def reshapepack(text, k, stride):
        n = text.shape[0]
        ns = -(-n // stride)
        pos = jnp.arange(n, dtype=jnp.int32)
        special_at = jnp.where(text >= CODE_N, pos, jnp.int32(n))
        next_special = jax.lax.cummin(special_at, reverse=True)
        s_pos = jnp.arange(ns, dtype=jnp.int32) * stride
        ns_s = next_special[::stride]
        rows = ns + -(-k // stride) + 1
        pad = rows * stride - n
        mat = jnp.concatenate([text, jnp.zeros((pad,), jnp.uint8)]).reshape(
            rows, stride)
        words = []
        for w0 in range(0, k, 16):
            acc = jnp.zeros((ns,), jnp.uint32)
            for t in range(w0, min(w0 + 16, k)):
                col = mat[t // stride:t // stride + ns,
                          t % stride].astype(jnp.uint32)
                mask = s_pos + t < ns_s
                acc = acc * 4 + jnp.where(mask, col, jnp.uint32(0))
            words.append(acc)
        valid = ns_s - s_pos >= k
        return tuple(words), valid

    w_cur, v_cur = cur(qt, k, stride)
    w_a, v_a = stridedpack(qt, k, stride)
    w_b, v_b = reshapepack(qt, k, stride)
    same_a = all(bool(jnp.array_equal(x, y)) for x, y in zip(w_cur, w_a)) \
        and bool(jnp.array_equal(v_cur, v_a))
    same_b = all(bool(jnp.array_equal(x, y)) for x, y in zip(w_cur, w_b)) \
        and bool(jnp.array_equal(v_cur, v_b))
    print(json.dumps({"exp": "packprof", "equal_strided": same_a,
                      "equal_reshape": same_b,
                      "ns": int(w_cur[0].shape[0])}))

    timed("pack_current_full_then_slice",
          lambda: np.asarray(cur(qt, k, stride)[0][0][:1]))
    timed("pack_strided_samples",
          lambda: np.asarray(stridedpack(qt, k, stride)[0][0][:1]))
    timed("pack_reshape_samples",
          lambda: np.asarray(reshapepack(qt, k, stride)[0][0][:1]))

    # bucket interval search alone, on precomputed sampled keys
    @jax.jit
    def bsearch(refk, starts, qk_w, qvalid):
        return sm._bucket_intervals(refk, starts, qk_w, qvalid, shift,
                                    probes)

    qk_w = tuple(jnp.asarray(x) for x in w_cur)
    qv = jnp.asarray(v_cur)
    timed("bucket_search_only",
          lambda: np.asarray(bsearch(refk, starts, qk_w, qv)[0][:1]))

    # valid/cummin pass alone
    @jax.jit
    def validonly(text):
        n = text.shape[0]
        pos = jnp.arange(n, dtype=jnp.int32)
        special_at = jnp.where(text >= CODE_N, pos, jnp.int32(n))
        return jax.lax.cummin(special_at, reverse=True)

    timed("cummin_valid_only", lambda: np.asarray(validonly(qt)[:1]))

    # full frontend for reference
    timed("frontend_bucket_full", lambda: np.asarray(
        sm.query_frontend_bucket(refk, starts, qt, k, shift, probes,
                                 stride)[3]))



def rankx():
    """Rank-kernel redesign A/B on the real chip (VERDICT r2 #3).

    Variants, all device-resident timed (consume with .sum(), fetch one
    scalar): Pallas per-query-DMA kernel (current), XLA row-gather
    (rank_rows_xla), XLA row-gather with blk-sorted queries (locality
    probe), raw jnp.take row-gather alone, and rank_batch (element-gather
    reference). GB/s charged at the honest 512 B HBM per query.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels import rank as rk
    from slamem_tpu.utils.synth import strain_pair

    size, batch = 5_000_000, 1 << 20
    ref, _ = strain_pair(size, seed=20260816)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    rows = rk.interleaved_rows(index)
    rng = np.random.default_rng(20260819)
    chars = jnp.asarray(rng.integers(0, 4, size=batch).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, index.n + 1, size=batch)
                      .astype(np.int32))

    # correctness first
    want = np.asarray(rank_batch(index, chars[:4096], pos[:4096]))
    got_x = np.asarray(rk.rank_rows_xla(rows, chars[:4096], pos[:4096]))
    got_p = np.asarray(rk.rank_pallas(index, chars[:4096], pos[:4096]))
    print(json.dumps({"exp": "rankx", "xla_ok": bool((want == got_x).all()),
                      "pallas_ok": bool((want == got_p).all()),
                      "nrows": int(rows.shape[0])}))

    def timed(name, fn, repeats=3):
        fn()
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        gbps = batch * 512 / dt / 1e9
        print(json.dumps({"exp": "rankx", "t": name, "s": dt,
                          "gb_per_s_512B": round(gbps, 2)}))
        sys.stdout.flush()

    @jax.jit
    def consume_pallas(chars, pos):
        return rk.rank_rows(rows, chars, pos).sum()

    @jax.jit
    def consume_xla(chars, pos):
        return rk.rank_rows_xla(rows, chars, pos).sum()

    @jax.jit
    def consume_sortedx(chars, pos):
        blk = pos // rk.SYMS_PER_ROW
        order = jnp.argsort(blk)
        r = rk.rank_rows_xla(rows, chars[order], pos[order])
        return r.sum()  # order-invariant consume; real callers unsort

    @jax.jit
    def consume_take(pos):
        blk = pos // rk.SYMS_PER_ROW
        return jnp.take(rows, blk, axis=0).sum(dtype=jnp.int32)

    @jax.jit
    def consume_ref(chars, pos):
        return rank_batch(index, chars, pos).sum()

    timed("pallas_kernel", lambda: np.asarray(consume_pallas(chars, pos)))
    timed("xla_rowgather", lambda: np.asarray(consume_xla(chars, pos)))
    timed("xla_rowgather_sorted",
          lambda: np.asarray(consume_sortedx(chars, pos)))
    timed("raw_take_rows", lambda: np.asarray(consume_take(pos)))
    timed("rank_batch_ref", lambda: np.asarray(consume_ref(chars, pos)))



def tailprof():
    """Break down the fused tail's 43 ms (stage bench r3, 5 Mbp headline).

    Incremental sub-pipelines at the exact production shapes, each its own
    jit, device-grounded by a tiny fetch: expand_seg alone, + sa gather,
    + 2-key sort, + run compaction, + kept filter. Deltas = stage costs.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    cfg = Config(min_length=20)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    # converge adaptive shapes
    m = sm.find_seed_matches(index, qry, cfg)
    m = sm.find_seed_matches(index, qry, cfg)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index) if stride != 1 else None
    starts, shift, probes = sm.bucket_table(index, k)
    last_pairs, last_runs, last_kept = sm._last_total(index, k, stride)
    capacity = sm.capacity_bucket(last_pairs, 1 << 18,
                                  int(cfg.pair_capacity_max))
    run_cap = sm.capacity_bucket(last_runs, 1 << 12,
                                 int(cfg.pair_capacity_max) // 8)
    kept_cap = min(run_cap, sm.capacity_bucket(last_kept, 1 << 12, run_cap))
    print(json.dumps({"exp": "tailprof", "k": k, "stride": stride,
                      "capacity": capacity, "run_cap": run_cap,
                      "kept_cap": kept_cap, "pairs": last_pairs,
                      "runs": last_runs, "kept": last_kept}))

    lo, width, _cum, _summ = sm.query_frontend_bucket(
        refk, starts, qt, k, shift, probes, stride)
    lo, width = jax.block_until_ready(lo), jax.block_until_ready(width)
    m_off = jnp.int32(m_p + 1)

    def timed(name, fn, repeats=3):
        fn()
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "tailprof", "t": name, "s": min(ts)}))
        sys.stdout.flush()

    @jax.jit
    def seg_only(lo, width):
        seg_c, sa_idx_raw, in_range = sm._expand_seg(lo, width, capacity)
        return seg_c[:1] + sa_idx_raw[:1] + in_range[:1].astype(jnp.int32)

    @jax.jit
    def plus_gather(sa_aug, lo, width):
        seg_c, sa_idx_raw, in_range = sm._expand_seg(lo, width, capacity)
        sa_idx = jnp.clip(sa_idx_raw, 0, sa_aug.shape[0] - 1)
        refpos_f = sa_aug[sa_idx]
        return refpos_f.sum(dtype=jnp.int32)

    @jax.jit
    def plus_sort(sa_aug, lo, width):
        d_s, q_s = sm._expand_pairs_core(sa_aug, lo, width, jnp.int32(0),
                                         m_off, capacity, stride)
        return d_s[:1] + q_s[:1]

    @jax.jit
    def plus_compact(sa_aug, lo, width):
        d_s, q_s = sm._expand_pairs_core(sa_aug, lo, width, jnp.int32(0),
                                         m_off, capacity, stride)
        out = sm._compact_pair_runs(d_s, q_s, run_cap)
        return out[0][:1] + out[1][:1] + out[2][:1]

    timed("expand_seg_only", lambda: np.asarray(seg_only(lo, width)))
    timed("plus_sa_gather",
          lambda: np.asarray(plus_gather(sa_aug, lo, width)))
    timed("plus_2key_sort", lambda: np.asarray(plus_sort(sa_aug, lo, width)))
    timed("plus_run_compact",
          lambda: np.asarray(plus_compact(sa_aug, lo, width)))

    # full fused for reference
    def full():
        out = sm.fused_query_bucket(
            index.text, refk, starts, sa_aug, qt, k, capacity, run_cap,
            shift, probes, cfg.match_backend, stride, ext_r,
            kept_capacity=kept_cap, minlen=int(cfg.min_length))
        return np.asarray(out[2])
    timed("fused_full", full)

    # sort variants at the same shape: 2-key vs stable-1-key-with-payload
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.integers(0, 10_000_000, capacity).astype(np.int32))
    q = jnp.asarray(rng.integers(0, 1 << 20, capacity).astype(np.int32))

    @jax.jit
    def sort2(d, q):
        a, b = jax.lax.sort((d, q), dimension=0, num_keys=2)
        return a[:1] + b[:1]

    @jax.jit
    def sort1stable(d, q):
        a, b = jax.lax.sort((d, q), dimension=0, num_keys=1,
                            is_stable=True)
        return a[:1] + b[:1]

    timed("sort_2key", lambda: np.asarray(sort2(d, q)))
    timed("sort_1key_stable", lambda: np.asarray(sort1stable(d, q)))



def splitprof():
    """Can a split expansion beat _expand_seg's 35 ms scatter wall?

    At the 5 Mbp headline shapes: width histogram (how thin is the ragged
    tail), lax.top_k cost at ns=721k, a scatter-cost scaling probe, and a
    full split-expansion prototype (per-sample first pair by gather +
    top_k-compacted residual scatter) timed against the production
    _expand_pairs_core, checked for identical sorted pairs. Plus a K-cap
    sweep (K=12/13/14 direct tables: 64 MB/256 MB/1 GB) probing whether
    table size sets the bucket-gather latency.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    cfg = Config(min_length=20)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    m = sm.find_seed_matches(index, qry, cfg)
    m = sm.find_seed_matches(index, qry, cfg)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    refk, sa_aug = sm.seed_table(index, k)
    starts, shift, probes = sm.bucket_table(index, k)
    last_pairs, last_runs, last_kept = sm._last_total(index, k, stride)
    capacity = sm.capacity_bucket(last_pairs, 1 << 18,
                                  int(cfg.pair_capacity_max))
    lo, width, _cum, _summ = sm.query_frontend_bucket(
        refk, starts, qt, k, shift, probes, stride)
    lo = jax.block_until_ready(lo)
    width = jax.block_until_ready(width)
    w_h = np.asarray(width)
    ns = w_h.size
    hist = np.bincount(np.minimum(w_h, 8), minlength=9)
    n_wide = int((w_h >= 2).sum())
    resid = int(w_h[w_h >= 2].sum() - n_wide)
    print(json.dumps({"exp": "splitprof", "ns": ns,
                      "pairs": int(w_h.sum()),
                      "hist_0..7_8plus": hist.tolist(),
                      "n_wide": n_wide, "resid_pairs": resid}))
    sys.stdout.flush()

    def timed(name, fn, repeats=3):
        fn()
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "splitprof", "t": name, "s": min(ts)}))
        sys.stdout.flush()

    # top_k cost at ns
    @jax.jit
    def topk(w):
        v, i = jax.lax.top_k(w, 1 << 17)
        return v[:1] + i[:1]
    timed("topk_131072_of_721k", lambda: np.asarray(topk(width)))

    # scatter scaling probe: scatter E elements into a capacity buffer
    for E in (1 << 17, 1 << 19, 1 << 20):
        idx = jnp.asarray(
            np.sort(np.random.default_rng(1).integers(
                0, capacity, E)).astype(np.int32))

        @jax.jit
        def scat(idx):
            return jnp.zeros((capacity,), jnp.int32).at[idx].add(
                1, mode="drop")[:1]
        timed(f"scatter_{E}_sorted", lambda s=scat, i=idx: np.asarray(s(i)))

    m_off = jnp.int32(m_p + 1)
    RESID = 1 << 17
    RESID_CAP = 1 << 17

    @jax.jit
    def split_expand(sa_aug, lo, width):
        # part A: every sample's FIRST pair, no scatter
        qpos_s = jnp.arange(ns, dtype=jnp.int32) * jnp.int32(stride)
        sa0 = sa_aug[jnp.clip(lo, 0, sa_aug.shape[0] - 1)]
        okA = (width >= 1) & (sa0 >= 0)
        refA = sa0 & jnp.int32(0x7FFFFFFF)
        dA = jnp.where(okA, refA - qpos_s + m_off, sm._I32MAX)
        qA = jnp.where(okA, jnp.arange(ns, dtype=jnp.int32), sm._I32MAX)
        # part B: residual intervals of the top-RESID widest samples
        wv, wi = jax.lax.top_k(width, RESID)
        lo_b = lo[wi] + 1
        w_b = jnp.maximum(wv - 1, 0)
        seg_c, sa_idx_raw, in_range = sm._expand_seg(lo_b, w_b, RESID_CAP)
        sa_idx = jnp.clip(sa_idx_raw, 0, sa_aug.shape[0] - 1)
        sb = sa_aug[sa_idx]
        qidx = wi[jnp.clip(seg_c, 0, RESID - 1)]
        okB = in_range & (sb >= 0)
        refB = sb & jnp.int32(0x7FFFFFFF)
        dB = jnp.where(okB, refB - qidx * jnp.int32(stride) + m_off,
                       sm._I32MAX)
        qB = jnp.where(okB, qidx, sm._I32MAX)
        d = jnp.concatenate([dA, dB])
        q = jnp.concatenate([qA, qB])
        d_s, q_s = jax.lax.sort((d, q), dimension=0, num_keys=2)
        overflow = (wv[RESID - 1] >= 2)  # wide sample missed top_k
        return d_s, q_s, overflow

    @jax.jit
    def prod_expand(sa_aug, lo, width):
        return sm._expand_pairs_core(sa_aug, lo, width, jnp.int32(0),
                                     m_off, capacity, stride)

    ds1, qs1, ovf = split_expand(sa_aug, lo, width)
    ds0, qs0 = prod_expand(sa_aug, lo, width)
    h1 = np.asarray(ds1), np.asarray(qs1)
    h0 = np.asarray(ds0), np.asarray(qs0)
    v1 = h1[0] != np.iinfo(np.int32).max
    v0 = h0[0] != np.iinfo(np.int32).max
    same = (np.array_equal(h1[0][v1], h0[0][v0])
            and np.array_equal(h1[1][v1], h0[1][v0]))
    print(json.dumps({"exp": "splitprof", "split_equal": bool(same),
                      "overflow": bool(np.asarray(ovf)),
                      "split_pairs": int(v1.sum()),
                      "prod_pairs": int(v0.sum())}))
    sys.stdout.flush()

    timed("split_expand_sort",
          lambda: np.asarray(split_expand(sa_aug, lo, width)[0][:1]))
    timed("prod_expand_sort",
          lambda: np.asarray(prod_expand(sa_aug, lo, width)[0][:1]))

    # K-cap sweep: table size vs end-to-end headline
    for kc in (14, 13, 12):
        c2 = Config(min_length=20, seed_length_cap=kc)
        mm = sm.find_seed_matches(index, qry, c2)
        mm = sm.find_seed_matches(index, qry, c2)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            mm = sm.find_seed_matches(index, qry, c2)
            ts.append(time.perf_counter() - t0)
        kk, ss, _sp = sm.choose_seed_plan(index.n, m_p, c2)
        print(json.dumps({"exp": "splitprof", "kcap": kc, "k": kk,
                          "stride": ss, "s": min(ts),
                          "mbp_per_s": len(qry) / 1e6 / min(ts),
                          "matches": int(mm.length.size)}))
        sys.stdout.flush()



def chr21k13():
    """chr21-scale (40 Mbp, -l 50) A/B: K=14 vs K=13 direct tables after
    the r3 frontend rewrite (K=13 won the 5 Mbp L=20 sweep; at L=50 the
    stride decouples from K, so fewer samples no longer favor small K —
    this measures whether the 4x-smaller table still pays)."""
    import jax

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(40_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "chr21k13", "build_s": time.perf_counter() - t0}))
    sys.stdout.flush()
    for kc in (14, 13, 16):
        cfg = Config(min_length=50, seed_length_cap=kc)
        mm = sm.find_seed_matches(index, qry, cfg)
        mm = sm.find_seed_matches(index, qry, cfg)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            mm = sm.find_seed_matches(index, qry, cfg)
            ts.append(time.perf_counter() - t0)
        kk, ss, _sp = sm.choose_seed_plan(index.n, len(qry), cfg)
        print(json.dumps({"exp": "chr21k13", "kcap": kc, "k": kk,
                          "stride": ss, "s": min(ts),
                          "mbp_per_s": len(qry) / 1e6 / min(ts),
                          "matches": int(mm.length.size),
                          "stats": mm.stats}))
        sys.stdout.flush()


def rankc():
    """Rank concurrency/row-width attack on the gather-latency floor
    (VERDICT r3 #4: >= 120 GB/s device-resident or a committed sweep
    proving the ceiling).

    The r3 sweep stopped at 2 KB rows on a 5 Mbp index — whose ENTIRE
    nibble table is ~2.5 MB, so "random" gathers were not honest HBM
    traffic. This experiment uses a 128 Mbp index (64 MB+ table, far past
    any cache) and sweeps row width 512 B..16 KB, unsorted vs row-sorted
    (sequentialized DMA streams), plus a take-only variant (row gather
    with no SWAR consume) to separate gather cost from compute. Batch is
    scaled per width to keep per-call traffic ~4 GB.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels import rank as rk
    from slamem_tpu.utils.synth import strain_pair

    size = 128_000_000
    ref, _ = strain_pair(size, seed=20260816)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "rankc", "build_s": time.perf_counter() - t0,
                      "n": index.n}))
    sys.stdout.flush()
    rng = np.random.default_rng(20260820)

    for row_words in (128, 512, 1024, 2048, 4096):
        row_bytes = row_words * 4
        batch = max(1 << 18, min(1 << 22, (4 << 30) // row_bytes))
        rows = rk.nibble_rows(index, row_words)
        jax.block_until_ready(rows)
        nrows = int(rows.shape[0])
        chars_h = rng.integers(0, 4, size=batch).astype(np.int32)
        pos_h = rng.integers(0, index.n + 1, size=batch).astype(np.int32)
        order = np.argsort(pos_h, kind="stable")
        nib_per = (row_words - 4) * 8
        uniq = len(np.unique(pos_h // nib_per))
        chars = jnp.asarray(chars_h)
        pos = jnp.asarray(pos_h)
        chars_s = jnp.asarray(chars_h[order])
        pos_s = jnp.asarray(pos_h[order])
        # correctness spot check at this width
        nv = 4096
        want = np.asarray(rank_batch(index, chars[:nv], pos[:nv]))
        got = np.asarray(rk.rank_rows_nib(rows, chars[:nv], pos[:nv]))
        ok = bool(np.array_equal(want, got))

        fn = jax.jit(lambda c, p, r=rows: rk.rank_rows_nib(r, c, p)
                     .sum(dtype=jnp.int64))

        def take_only(p, r=rows, npr=nib_per):
            return jnp.take(r, p // npr, axis=0).sum(dtype=jnp.uint32)

        tk = jax.jit(take_only)

        def timed(f, *a):
            np.asarray(f(*a))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(*a))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        res = {"exp": "rankc", "row_bytes": row_bytes, "batch": batch,
               "nrows": nrows, "uniq_rows_touched": uniq, "equal": ok}
        t_u = timed(fn, chars, pos)
        res["unsorted_s"] = t_u
        res["unsorted_gb_per_s"] = batch * row_bytes / t_u / 1e9
        res["unsorted_ns_per_q"] = t_u / batch * 1e9
        t_s = timed(fn, chars_s, pos_s)
        res["sorted_s"] = t_s
        res["sorted_gb_per_s"] = batch * row_bytes / t_s / 1e9
        t_t = timed(tk, pos)
        res["take_only_s"] = t_t
        res["take_only_gb_per_s"] = batch * row_bytes / t_t / 1e9
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in res.items()}))
        sys.stdout.flush()
        del rows
        rk._rows_nib_cache.clear()


def rankc2():
    """Second rank-concurrency round: attack the two walls rankc exposed.

    rankc (128 Mbp, honest HBM) measured: pure row-gather (take-only)
    saturates ~81-88 GB/s at 4-8 KB rows while the full SWAR path LOSES
    ground at 8 KB (61.5) — the per-row mask+popcount+lane-reduce is
    compute-bound at wide rows. Variants here:

      * mm_reduce: replace the lane-dimension popcount sum with an int8 x
        int8 -> int32 dot against ones (MXU does the reduction, VPU only
        the SWAR ops);
      * take4: the batch split into 4 independent gathers summed in one
        program — does XLA overlap independent gather streams?

    (A half-anchored count — counting toward the nearer row edge to halve
    the masked SWAR work — is the next candidate if the reduce is not the
    wall.)
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels import rank as rk
    from slamem_tpu.utils.synth import strain_pair

    size = 128_000_000
    ref, _ = strain_pair(size, seed=20260816)
    t0 = time.perf_counter()
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    print(json.dumps({"exp": "rankc2", "build_s": time.perf_counter() - t0}))
    sys.stdout.flush()
    rng = np.random.default_rng(20260821)

    def timed(f, *a):
        np.asarray(f(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for row_words in (512, 1024, 2048):
        row_bytes = row_words * 4
        batch = max(1 << 18, min(1 << 22, (4 << 30) // row_bytes))
        rows = rk.nibble_rows(index, row_words)
        jax.block_until_ready(rows)
        nib_per = (row_words - 4) * 8
        chars_h = rng.integers(0, 4, size=batch).astype(np.int32)
        pos_h = rng.integers(0, index.n + 1, size=batch).astype(np.int32)
        chars = jnp.asarray(chars_h)
        pos = jnp.asarray(pos_h)

        def swar_nz(w, c32):
            rep = c32 * jnp.uint32(0x11111111)
            y = w ^ rep[:, None]
            t = y & jnp.uint32(0x77777777)
            return ~((t + jnp.uint32(0x77777777)) | y) & jnp.uint32(0x88888888)

        def mm_reduce(c, p, r=rows, npr=nib_per, rw=row_words):
            c32 = c.astype(jnp.uint32)
            p32 = p.astype(jnp.int32)
            blk = p32 // npr
            within = p32 - blk * npr
            row = jnp.take(r, blk, axis=0)
            base = jnp.take_along_axis(row[:, :4],
                                       c.astype(jnp.int32)[:, None],
                                       axis=1)[:, 0]
            w = row[:, 4:]
            nz = swar_nz(w, c32)
            widx = jnp.arange(rw - 4, dtype=jnp.int32)[None, :]
            wf = (within // 8)[:, None]
            pmask = ((jnp.uint32(1) << ((within % 8).astype(jnp.uint32) * 4))
                     - jnp.uint32(1))[:, None]
            mask = jnp.where(widx < wf, jnp.uint32(0xFFFFFFFF),
                             jnp.where(widx == wf, pmask, jnp.uint32(0)))
            pc = jax.lax.population_count(nz & mask).astype(jnp.int8)
            ones = jnp.ones((rw - 4,), jnp.int8)
            cnt = jax.lax.dot_general(pc, ones, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return ((base + cnt.astype(jnp.uint32))
                    .astype(jnp.int32)).sum(dtype=jnp.int64)

        def take4(p, r=rows, npr=nib_per):
            blk = p // npr
            qs = jnp.split(blk, 4)
            acc = jnp.zeros((), jnp.uint32)
            for q in qs:
                acc += jnp.take(r, q, axis=0).sum(dtype=jnp.uint32)
            return acc

        base_fn = jax.jit(lambda c, p, r=rows:
                          rk.rank_rows_nib(r, c, p).sum(dtype=jnp.int64))
        mm_fn = jax.jit(mm_reduce)
        t4_fn = jax.jit(take4)

        # correctness of mm_reduce vs reference (sum equality is weak; use
        # element compare on a small slice via direct call)
        nv = 4096
        want = np.asarray(rank_batch(index, chars[:nv], pos[:nv]))
        got = np.asarray(rk.rank_rows_nib(rows, chars[:nv], pos[:nv]))
        ok = bool(np.array_equal(want, got))

        res = {"exp": "rankc2", "row_bytes": row_bytes, "batch": batch,
               "equal_nib": ok}
        t = timed(base_fn, chars, pos)
        res["swar_gb_per_s"] = batch * row_bytes / t / 1e9
        try:
            t = timed(mm_fn, chars, pos)
            res["mm_gb_per_s"] = batch * row_bytes / t / 1e9
        except Exception as e:
            res["mm_error"] = str(e)[:120]
        try:
            t = timed(t4_fn, pos)
            res["take4_gb_per_s"] = batch * row_bytes / t / 1e9
        except Exception as e:
            res["take4_error"] = str(e)[:120]
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in res.items()}))
        sys.stdout.flush()
        del rows
        rk._rows_nib_cache.clear()


def splitprof2():
    """top_k vs compaction selection inside the split expansion, plus the
    end-to-end headline after the compaction swap.

    The split expansion needs "the width>=2 samples" for part B; round 3
    selected them with lax.top_k(width, resid_k). This measures the raw
    selection cost both ways at the headline shape (630K samples,
    resid_k ~ 49K) and the production find_seed_matches rate.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(5_000_000, seed=20260816, sub_rate=0.015,
                           indel_rate=0.0015)
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=20)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    plan = sm.plan_fused(index, m_p, cfg, qry)
    k, stride = plan.k, plan.stride
    refk, _sa = sm.seed_table(index, k)
    starts, shift, probes = sm.bucket_table(index, k)
    lo, width, cum, summ = sm.query_frontend_bucket(refk, starts, qt, k,
                                                    shift, probes, stride)
    ns = int(lo.shape[0])
    resid_k = plan.split[0] if plan.split else 49152
    print(json.dumps({"exp": "splitprof2", "ns": ns, "resid_k": resid_k,
                      "plan_split": plan.split}))
    sys.stdout.flush()

    @jax.jit
    def via_topk(width):
        wv, wi = jax.lax.top_k(width, resid_k)
        return wv.sum() + wi.sum()

    @jax.jit
    def via_compact(width):
        slot_ids = jnp.arange(width.shape[0], dtype=jnp.int32)
        wide = width >= 2
        widx = jnp.cumsum(wide.astype(jnp.int32)) - 1
        bslot = jnp.where(wide, jnp.minimum(widx, resid_k), resid_k)
        wi = jnp.zeros((resid_k,), jnp.int32).at[bslot].set(slot_ids,
                                                            mode="drop")
        wv = jnp.zeros((resid_k,), jnp.int32).at[bslot].set(width,
                                                            mode="drop")
        return wv.sum() + wi.sum()

    def timed(name, fn, *a, repeats=5):
        np.asarray(fn(*a))
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"exp": "splitprof2", "t": name,
                          "ms": round(min(ts) * 1e3, 3)}))
        sys.stdout.flush()

    timed("topk_select", via_topk, width)
    timed("compact_select", via_compact, width)

    # end-to-end with the compaction-based split (production path)
    sm.find_seed_matches(index, qry, cfg)
    sm.find_seed_matches(index, qry, cfg)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        m = sm.find_seed_matches(index, qry, cfg)
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"exp": "splitprof2", "headline_s": min(ts),
                      "mbp_per_s": len(qry) / 1e6 / min(ts),
                      "matches": int(m.length.size), "stats": m.stats}))


def saprobe():
    """Lowering A/B for the fused (starts, sa0) gather.

    bench showed the vmapped 2D (2,2) dynamic_slice at 630K samples costs
    ~1 s on chip, and saprobe v1 found why: a (nb+1, 2) int32 array takes
    tile layout T(8,128) — the 2-wide minor dim pads to 128 lanes, 64x
    the memory (34 GB for the K=13 table; XLA AOT refuses to even
    allocate it). Narrow-minor-dim 2D tables are unusable on TPU. Times
    the 1D formulations instead: (a) production paired int32 (2,) slice
    on starts + separate sa0 gather (2 random accesses), (b) ONE paired
    (2,) slice on an int64-PACKED table t64[i] = sa0[i]<<32 | starts[i]
    (1 random access, 16 B).
    """
    import slamem_tpu  # noqa: F401  (enables x64 — uint64 packing needs it)
    import jax
    import jax.numpy as jnp

    nb = 1 << 26
    m = 630784
    rng = np.random.default_rng(20260822)
    starts = jnp.asarray(np.sort(rng.integers(0, 5_000_000, nb + 1))
                         .astype(np.int32))
    sa0 = jnp.asarray(rng.integers(0, 5_000_000, nb + 1).astype(np.int32))

    @jax.jit
    def pack64(starts, sa0):
        lo32 = starts.astype(jnp.uint32).astype(jnp.uint64)
        hi32 = sa0.astype(jnp.uint32).astype(jnp.uint64)
        return jax.lax.bitcast_convert_type(lo32 | (hi32 << 32), jnp.int64)

    t64 = pack64(starts, sa0)
    jax.block_until_ready(t64)
    b = jnp.asarray(rng.integers(0, nb, m).astype(np.int32))

    # tables as ARGUMENTS, not closures: a closed-over device array embeds
    # as an HLO constant and the 256 MB table blows the remote-compile
    # request limit (HTTP 413, saprobe v2)
    @jax.jit
    def paired_i32_plus_sa(starts, sa0, b):
        pair = jax.vmap(
            lambda i: jax.lax.dynamic_slice(starts, (i,), (2,)))(b)
        sa = sa0[jnp.clip(pair[:, 0], 0, nb)]
        return pair.sum(dtype=jnp.int64) + sa.sum(dtype=jnp.int64)

    @jax.jit
    def packed64(t64, b):
        pair = jax.vmap(
            lambda i: jax.lax.dynamic_slice(t64, (i,), (2,)))(b)
        u = jax.lax.bitcast_convert_type(pair, jnp.uint64)
        lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
        sa = (u >> 32).astype(jnp.int32)
        return lo.sum(dtype=jnp.int64) + sa[:, 0].sum(dtype=jnp.int64)

    for name, fn in (("paired_i32_plus_sa0_gather",
                      lambda b: paired_i32_plus_sa(starts, sa0, b)),
                     ("packed64_single_slice",
                      lambda b: packed64(t64, b))):
        try:
            np.asarray(fn(b))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(fn(b))
                ts.append(time.perf_counter() - t0)
            print(json.dumps({"exp": "saprobe", "t": name,
                              "ms": round(min(ts) * 1e3, 3)}))
        except Exception as e:
            print(json.dumps({"exp": "saprobe", "t": name,
                              "error": str(e)[:150]}))
        sys.stdout.flush()


def chr1split():
    """Forced-split A/B at the chr1 shape (250 Mbp ref, 50 Mbp query,
    -l 50): the split gate (2*resid <= capacity/2) disables split there
    because the residual mass is ~2.2M of 5.6M pairs. Measures the fused
    dispatch with split=None vs a forced split sized from the true
    residual, device-grounded, to decide whether the gate should widen.
    """
    import jax
    import jax.numpy as jnp

    from slamem_tpu.config import Config
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.index.build import build_index
    from slamem_tpu.utils.synth import strain_pair

    ref, qry = strain_pair(250_000_000, seed=20260816, sub_rate=0.03,
                           indel_rate=0.003)
    qry = qry[:50_000_000]
    index = build_index(ref)
    jax.block_until_ready(index.sa)
    cfg = Config(min_length=50)
    qp, qt = sm.query_to_device(qry)
    m_p = int(qp.shape[0])
    # converge the adaptive plan first
    sm.find_seed_matches(index, qry, cfg)
    sm.find_seed_matches(index, qry, cfg)
    plan = sm.plan_fused(index, m_p, cfg, qry)
    k, stride = plan.k, plan.stride
    refk, sa_aug = sm.seed_table(index, k)
    ext_r = sm.ext_table(index)
    ext_q = sm.query_ext_table(qt)
    starts, shift, probes = sm.bucket_table(index, k)
    last_pairs, last_runs, last_kept = sm._last_total(index, k, stride)
    nz = sm._last_nonzero(index, k, stride)
    resid = max(0, last_pairs - (nz or 0))
    print(json.dumps({"exp": "chr1split", "plan": str(plan)[:160],
                      "pairs": last_pairs, "nonzero": nz, "resid": resid}))
    sys.stdout.flush()

    m_s = -(-m_p // stride)
    resid_cap = sm.capacity_bucket(resid, 1 << 16, plan.capacity)
    variants = {"split_none": None,
                "split_forced": (min(resid_cap, m_s), resid_cap)}
    for name, split in variants.items():
        def dispatch(split=split):
            out = sm.fused_query_bucket(
                index.text, refk, starts, sa_aug, qt, k, plan.capacity,
                plan.run_cap, shift, probes, "sort", stride, ext_r,
                kept_capacity=plan.kept_cap, minlen=int(cfg.min_length),
                split=split, ext_q=ext_q)
            return np.asarray(out[2])  # summary grounds the dispatch
        try:
            dispatch()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                dispatch()
                ts.append(time.perf_counter() - t0)
            print(json.dumps({"exp": "chr1split", "t": name,
                              "s": round(min(ts), 4)}))
        except Exception as e:
            print(json.dumps({"exp": "chr1split", "t": name,
                              "error": str(e)[:150]}))
        sys.stdout.flush()


if __name__ == "__main__":
    globals()[sys.argv[1]]()
