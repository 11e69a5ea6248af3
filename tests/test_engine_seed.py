"""Seed-engine parity vs the CPU oracle (SURVEY.md §4 items 1 and 5)."""

import numpy as np
import pytest

from slamem_tpu.config import Config, MatchMode
from slamem_tpu.engine.seed_mode import apply_mode_filter, find_seed_matches
from slamem_tpu.index.build import build_index
from slamem_tpu.io import parse_fasta_bytes, str_to_codes
from slamem_tpu.oracle import oracle_matches
from slamem_tpu.utils.synth import mutate, random_genome, with_n_runs


def engine_tuples(index, qcodes, cfg):
    m = apply_mode_filter(find_seed_matches(index, qcodes, cfg), cfg)
    return sorted(zip(m.refpos.tolist(), m.qpos.tolist(), m.length.tolist()))


def oracle_tuples(rtext, qcodes, cfg):
    return sorted((r, q, ln) for r, q, ln in
                  oracle_matches(rtext, qcodes, cfg.min_length,
                                 cfg.mode.value))


def check(rtext, qcodes, cfg):
    index = build_index(np.asarray(rtext, np.uint8), occ_block=32)
    got = engine_tuples(index, np.asarray(qcodes, np.uint8), cfg)
    want = oracle_tuples(np.asarray(rtext, np.uint8),
                         np.asarray(qcodes, np.uint8), cfg)
    assert got == want, (f"engine={got[:10]}... ({len(got)}) "
                         f"oracle={want[:10]}... ({len(want)})")


def test_identical_sequences():
    t = str_to_codes("ACGTAGGCTTACGATCGATT")
    check(t, t, Config(min_length=5))


def test_strain_pair_mem():
    ref = random_genome(4000, seed=3)
    qry = mutate(ref, 0.02, 0.002, seed=4)
    check(ref, qry, Config(min_length=12))


def test_min_length_exact_boundary():
    # matches of exactly L must be kept, L-1 dropped; K == L here
    ref = str_to_codes("TTTTACGTACGGGGG")
    qry = str_to_codes("CCCACGTACGCCC")
    check(ref, qry, Config(min_length=7))   # "ACGTACG" len 7
    check(ref, qry, Config(min_length=8))   # no match of 8


def test_k_smaller_than_l():
    # seed_length_cap < L exercises run-length filtering with K < L
    ref = random_genome(3000, seed=5)
    qry = mutate(ref, 0.03, 0.003, seed=6)
    check(ref, qry, Config(min_length=15, seed_length_cap=8))


def test_multiround_capacity():
    # force many expansion rounds + cross-round run merging
    ref = random_genome(2000, seed=7)
    qry = mutate(ref, 0.01, 0.001, seed=8)
    check(ref, qry, Config(min_length=10, pair_capacity=64, position_block=37))


def test_n_runs_and_boundaries():
    ref = with_n_runs(random_genome(1500, seed=9), 5, 30, seed=10)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=11), 4, 25, seed=12)
    check(ref, qry, Config(min_length=10))


def test_multifasta_reference():
    fs = parse_fasta_bytes(
        b">r1\n" + b"ACGTACGTGGAT" * 6 + b"\n>r2\n" + b"TTGACCAGGATCC" * 5 + b"\n")
    rtext, _ = fs.with_separators()
    qry = np.concatenate([str_to_codes("ACGTACGTGGAT"),
                          str_to_codes("TTGACCAGGATCC")])
    check(rtext, qry, Config(min_length=10))


def test_low_complexity_repeats():
    # poly-A + tandem repeats: wide intervals, many overlapping matches
    ref = np.concatenate([np.zeros(60, np.uint8), str_to_codes("ACGT" * 30),
                          random_genome(500, seed=13)])
    qry = np.concatenate([np.zeros(40, np.uint8), str_to_codes("ACGT" * 20),
                          mutate(random_genome(500, seed=13), 0.02, 0, seed=14)])
    check(ref, qry, Config(min_length=8, pair_capacity=1 << 14))


def test_mam_mode():
    ref = random_genome(1500, seed=15)
    # plant a duplicated segment so MAM differs from MEM
    ref[700:780] = ref[100:180]
    qry = mutate(ref, 0.01, 0.001, seed=16)
    check(ref, qry, Config(min_length=12, mode=MatchMode.MAM))


def test_mum_mode():
    ref = random_genome(1200, seed=17)
    ref[600:660] = ref[100:160]          # ref-side duplication
    qry = mutate(ref, 0.01, 0.001, seed=18)
    qry = np.concatenate([qry, qry[200:260]])  # query-side duplication
    check(ref, qry, Config(min_length=12, mode=MatchMode.MUM))


def test_match_at_sequence_edges():
    ref = str_to_codes("ACGTACGTAA")
    qry = str_to_codes("ACGTACGTAA")
    check(ref, qry, Config(min_length=10))  # full-length match at both edges
    check(str_to_codes("GGACGTACGTAA"), qry, Config(min_length=10))


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_property_random(seed):
    rng = np.random.default_rng(seed)
    n, m = int(rng.integers(200, 800)), int(rng.integers(200, 800))
    ref = rng.integers(0, 4, size=n).astype(np.uint8)
    qry = rng.integers(0, 4, size=m).astype(np.uint8)
    # small alphabet-ish: overwrite chunks to create matches
    for _ in range(6):
        ln = int(rng.integers(10, 60))
        if n > ln and m > ln:
            r0 = int(rng.integers(0, n - ln))
            q0 = int(rng.integers(0, m - ln))
            qry[q0:q0 + ln] = ref[r0:r0 + ln]
    L = int(rng.integers(8, 14))
    mode = [MatchMode.MEM, MatchMode.MAM, MatchMode.MUM][seed % 3]
    check(ref, qry, Config(min_length=L, mode=mode))


def test_all_n_query():
    ref = random_genome(500, seed=200)
    qry = np.full(300, 4, np.uint8)  # all N
    check(ref, qry, Config(min_length=10))


def test_tiny_reference():
    ref = str_to_codes("ACGT")  # shorter than K
    qry = random_genome(100, seed=201)
    check(ref, qry, Config(min_length=4))
    check(ref, qry, Config(min_length=2))


def test_query_shorter_than_l():
    ref = random_genome(400, seed=202)
    qry = ref[:8].copy()
    check(ref, qry, Config(min_length=10))  # no window fits -> no matches
    check(ref, qry, Config(min_length=8))   # exactly one window


def test_bucket_frontend_large_ref():
    # forced bucket frontend (auto picks join below the measured n > 64m
    # crossover, seed_mode.prefer_bucket); parity vs oracle proves it
    ref = random_genome(6000, seed=210)
    qry = mutate(ref, 0.02, 0.002, seed=211)[:1000]
    check(ref, qry, Config(min_length=12, frontend="bucket"))
    check(with_n_runs(ref, 4, 50, seed=212), qry,
          Config(min_length=12, frontend="bucket"))


def test_auto_frontend_crossover():
    from slamem_tpu.engine.seed_mode import prefer_bucket

    assert not prefer_bucket(5_000_000, 5_000_000)    # config #1: join
    assert not prefer_bucket(250_000_000, 50_000_000)  # chr1 pair: join
    assert prefer_bucket(250_000_000, 1_000_000)       # short serving query


def test_bucket_vs_join_identical():
    from slamem_tpu.engine.seed_mode import (
        bucket_table, packed_kmers, seed_table, _bucket_intervals,
        _join_intervals)
    import jax.numpy as jnp

    ref = with_n_runs(random_genome(8000, seed=213), 3, 60, seed=214)
    qry = mutate(ref, 0.03, 0.003, seed=215)[:2000]
    idx = build_index(ref)
    k = 12
    refk, _ = seed_table(idx, k)
    qk, qv = packed_kmers(jnp.asarray(qry, np.uint8), k)
    lo_j, w_j = _join_intervals(refk, qk, qv)
    starts, shift, probes = bucket_table(idx, k)
    lo_b, w_b = _bucket_intervals(refk, starts, qk, qv, shift, probes)
    assert np.array_equal(np.asarray(w_j), np.asarray(w_b))
    sel = np.asarray(w_j) > 0
    assert np.array_equal(np.asarray(lo_j)[sel], np.asarray(lo_b)[sel])


def test_capacity_bucket_grid():
    from slamem_tpu.engine.seed_mode import capacity_bucket

    lo, hi = 1 << 18, 1 << 25
    assert capacity_bucket(0, lo, hi) == lo
    # ~3% headroom pushes an exact-floor total to the next bucket (3*2^17)
    assert capacity_bucket(1 << 18, lo, hi) == 3 << 17
    # the measured headline workload (3.84M pairs) lands on 4M
    assert capacity_bucket(3_835_050, lo, hi) == 1 << 22
    assert capacity_bucket(5_000_000, lo, hi) == 3 << 21
    assert capacity_bucket(1 << 30, lo, hi) == hi  # ceiling clamp


def test_adaptive_capacity_tracks_pair_mass(monkeypatch):
    """A repeat query on the same index snaps the fused buffers to the
    observed (pairs, runs) bucket and returns identical matches."""
    from slamem_tpu.engine import seed_mode

    monkeypatch.setattr(seed_mode, "_GROWTH_MIN_CAPACITY", 64)
    seed_mode._last_total_cache.clear()
    picked = []
    orig = seed_mode.capacity_bucket
    monkeypatch.setattr(
        seed_mode, "capacity_bucket",
        lambda *a: picked.append(orig(*a)) or picked[-1])
    ref = random_genome(3000, seed=233)
    qry = mutate(ref, 0.01, 0.001, seed=234)
    cfg = Config(min_length=12, pair_capacity=1 << 14,
                 pair_capacity_max=1 << 15)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    first = engine_tuples(index, np.asarray(qry, np.uint8), cfg)
    assert not picked  # no prediction available on the first call
    second = engine_tuples(index, np.asarray(qry, np.uint8), cfg)
    assert second == first
    assert picked  # repeat call resized from the recorded workload
    assert all(p <= 1 << 15 for p in picked)  # ceiling respected


def test_adaptive_capacity_growth(monkeypatch):
    """The grown-buffer fallback path must be exact (miniature rehearsal)."""
    from slamem_tpu.engine import seed_mode

    monkeypatch.setattr(seed_mode, "_GROWTH_MIN_CAPACITY", 64)
    seed_mode._last_total_cache.clear()
    ref = random_genome(1500, seed=230)
    qry = mutate(ref, 0.01, 0.001, seed=231)
    # tiny capacity forces overflow; growth then raises rounds to max
    cfg = Config(min_length=10, pair_capacity=128, pair_capacity_max=1024)
    check(ref, qry, cfg)
    # second query on the same index exercises the fused-skip heuristic
    check(ref, qry, cfg)


# ---------------------------------------------------------------------------
# Dual-word (K <= 32) seed frontend
# ---------------------------------------------------------------------------

def _force_deep_seeds(monkeypatch, seed_mode):
    """Bypass the collision heuristic so K = min(L, cap) even at toy scale."""
    monkeypatch.setattr(seed_mode, "choose_seed_k",
                        lambda n, m, L, cap: min(L, cap))


def test_two_word_table_non_decreasing():
    import jax.numpy as jnp
    from slamem_tpu.engine.seed_mode import seed_table

    ref = with_n_runs(random_genome(3000, seed=301), 3, 25, seed=302)
    idx = build_index(ref)
    refk_words, _ = seed_table(idx, 24)
    assert len(refk_words) == 2
    w0 = np.asarray(refk_words[0]).astype(np.uint64)
    w1 = np.asarray(refk_words[1]).astype(np.uint64)
    combined = (w0 << np.uint64(32)) | w1
    assert np.all(combined[1:] >= combined[:-1])


def test_two_word_intervals_match_bruteforce():
    import jax.numpy as jnp
    from slamem_tpu.engine.seed_mode import (
        packed_key_words, seed_intervals, seed_table)

    ref = random_genome(2000, seed=303)
    qry = mutate(ref, 0.02, 0.002, seed=304)
    k = 20
    idx = build_index(ref)
    refk_words, _ = seed_table(idx, k)
    qk_words, qv = packed_key_words(jnp.asarray(qry, np.uint8), k)
    lo, w = seed_intervals(refk_words, qk_words, qv)
    lo, w = np.asarray(lo), np.asarray(w)
    # brute force: compare k-length windows of text[sa[r]:] with the query
    text = np.asarray(idx.text)
    sa = np.asarray(idx.sa)
    n = len(text)

    def window(p):
        wdw = text[p:p + k]
        if len(wdw) < k or (wdw >= 4).any():
            return None
        return bytes(wdw.tolist())

    table = [window(p) for p in sa]
    for i in range(0, len(qry) - k, 37):
        wdw = np.asarray(qry, np.uint8)[i:i + k]
        if len(wdw) < k or (wdw >= 4).any():
            continue
        qb = bytes(wdw.tolist())
        cnt = sum(1 for t in table if t == qb)
        assert int(w[i]) == cnt, (i, int(w[i]), cnt)


def test_two_word_full_pipeline_oracle_parity(monkeypatch):
    from slamem_tpu.engine import seed_mode

    _force_deep_seeds(monkeypatch, seed_mode)
    ref = with_n_runs(random_genome(4000, seed=305), 2, 30, seed=306)
    qry = with_n_runs(mutate(ref, 0.015, 0.0015, seed=307), 2, 20, seed=308)
    check(ref, qry, Config(min_length=24))          # K = 24, two words
    check(ref, qry, Config(min_length=40))          # K = 32 cap, L > K
    for mode in (MatchMode.MAM, MatchMode.MUM):
        check(np.concatenate([ref, ref[100:400]]), qry,
              Config(min_length=24, mode=mode))


def test_two_word_bucket_vs_join_identical(monkeypatch):
    import jax.numpy as jnp
    from slamem_tpu.engine.seed_mode import (
        bucket_table, packed_key_words, seed_table, _bucket_intervals,
        _join_intervals)

    ref = with_n_runs(random_genome(8000, seed=309), 3, 60, seed=310)
    qry = mutate(ref, 0.03, 0.003, seed=311)[:2000]
    idx = build_index(ref)
    k = 26
    refk_words, _ = seed_table(idx, k)
    qk_words, qv = packed_key_words(jnp.asarray(qry, np.uint8), k)
    lo_j, w_j = _join_intervals(refk_words, qk_words, qv)
    starts, shift, probes = bucket_table(idx, k)
    lo_b, w_b = _bucket_intervals(refk_words, starts, qk_words, qv, shift,
                                  probes)
    assert np.array_equal(np.asarray(w_j), np.asarray(w_b))
    sel = np.asarray(w_j) > 0
    assert np.array_equal(np.asarray(lo_j)[sel], np.asarray(lo_b)[sel])


def test_lex_searchsorted_matches_numpy():
    import jax.numpy as jnp
    from slamem_tpu.engine.seed_mode import lex_searchsorted

    rng = np.random.default_rng(312)
    table = rng.integers(0, 50, size=(500, 2)).astype(np.uint32)
    order = np.lexsort((table[:, 1], table[:, 0]))
    table = table[order]
    q = rng.integers(0, 50, size=(200, 2)).astype(np.uint32)
    comb_t = table[:, 0].astype(np.uint64) * 64 + table[:, 1]
    comb_q = q[:, 0].astype(np.uint64) * 64 + q[:, 1]
    for side in ("left", "right"):
        got = np.asarray(lex_searchsorted(
            (jnp.asarray(table[:, 0]), jnp.asarray(table[:, 1])),
            (jnp.asarray(q[:, 0]), jnp.asarray(q[:, 1])), side))
        want = np.searchsorted(comb_t, comb_q, side=side)
        assert np.array_equal(got, want)


def test_choose_seed_k_policy():
    from slamem_tpu.engine.seed_mode import choose_seed_k

    # bacterial scale at L=20: one word suffices (noise ~ 5.8k pairs)
    assert choose_seed_k(5_000_000, 5_000_000, 20, 32) == 16
    # chr21-scale synthetic at L=50: K=16 noise is ~373k pairs — still under
    # the budget fraction, single word stays
    assert choose_seed_k(40_000_000, 40_000_000, 50, 32) == 16
    # chr1 scale: K=16 noise ~ 11.6M pairs, two words take over
    assert choose_seed_k(250_000_000, 200_000_000, 50, 32) == 32
    # explicit small cap is honored
    assert choose_seed_k(250_000_000, 200_000_000, 50, 12) == 12
    assert choose_seed_k(1000, 1000, 10, 32) == 10


def test_seed_matches_carry_roofline_stats():
    """Every seed query reports pairs/rounds/K and a bytes lower bound."""
    ref = random_genome(3000, seed=320)
    qry = mutate(ref, 0.02, 0.002, seed=321)
    idx = build_index(ref)
    m = find_seed_matches(idx, qry, Config(min_length=12))
    assert m.stats is not None
    assert m.stats["pairs"] > 0
    assert m.stats["rounds"] >= 1
    # choose_seed_k_sparse: L=12 -> K=8 with stride 5
    assert m.stats["k"] == 8
    assert m.stats["bytes_min"] > 0
    # multi-round path carries stats too
    m2 = find_seed_matches(idx, qry, Config(min_length=12,
                                            pair_capacity=256))
    assert m2.stats is not None and m2.stats["rounds"] >= 1


def test_phase_log_roofline_fields():
    from slamem_tpu.utils.log import PhaseLog

    log = PhaseLog(enabled=False)
    with log.phase("query", bp=1_000_000) as rec:
        rec.update(bytes=819_000_000)  # exactly 1 GB/s-second at 819 GB/s
    r = log.records[-1]
    assert r["phase"] == "query"
    assert "gb_per_s" in r and "hbm_fraction" in r and "mbp_per_s" in r


def test_match_backend_parity():
    # sort (default) and boundary backends must be bit-identical, fused
    # single-dispatch and planned multi-round alike
    ref = random_genome(20_000, seed=50)
    qry = mutate(ref, 0.02, 0.002, seed=51)
    index = build_index(np.asarray(ref, np.uint8))
    for cap in (1 << 20, 4096):  # fused path / multi-round planned path
        srt = engine_tuples(index, qry, Config(
            min_length=12, pair_capacity=cap))
        bnd = engine_tuples(index, qry, Config(
            min_length=12, pair_capacity=cap, match_backend="boundary"))
        assert srt == bnd
        assert len(srt) > 0


def test_prefer_bucket_measured_crossover():
    """The frontend cost model (chr21sparse/prof2 measurements) picks the
    frontends that actually measured faster on v5e."""
    from slamem_tpu.engine.seed_mode import prefer_bucket

    # chr21 sparse: n=40M, m_s=2.5M, 1 word, probes=5 -> bucket measured
    # 0.50 s vs join 0.85 s
    assert prefer_bucket(40_000_000, 2_500_000, 1, 5)
    # headline: n=5M, m_s=1M -> join measured at parity or better
    assert not prefer_bucket(5_000_000, 1_000_000, 1, 4)
    # chr1 replicated: n=250M, m_s=3.1M, 2 words, probes=7 -> bucket
    # measured 1.5 s vs join 7.6 s
    assert prefer_bucket(250_000_000, 3_125_000, 2, 7)
    # tiny reference never prefers probing
    assert not prefer_bucket(4_000, 4_000, 1, 3)


def test_adaptive_run_cap_decoupled(monkeypatch):
    """The run buffer snaps to the observed run count independently of the
    pair buffer (a coupled capacity//16 run buffer inflated the pair
    buffer 4x on run-dense workloads)."""
    from slamem_tpu.engine import seed_mode

    monkeypatch.setattr(seed_mode, "_GROWTH_MIN_CAPACITY", 64)
    seed_mode._last_total_cache.clear()
    calls = []
    orig = seed_mode.capacity_bucket

    def spy(total, floor_cap, ceil_cap):
        calls.append((total, floor_cap, ceil_cap))
        return orig(total, floor_cap, ceil_cap)

    monkeypatch.setattr(seed_mode, "capacity_bucket", spy)
    ref = random_genome(3000, seed=235)
    qry = mutate(ref, 0.01, 0.001, seed=236)
    cfg = Config(min_length=12, pair_capacity=1 << 14,
                 pair_capacity_max=1 << 15)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    first = engine_tuples(index, np.asarray(qry, np.uint8), cfg)
    second = engine_tuples(index, np.asarray(qry, np.uint8), cfg)
    assert second == first
    # the repeat call sized pairs AND runs from their own observed counts
    (_sa, pairs, runs, kept, _nz, _elig), = list(
        seed_mode._last_total_cache.values())
    assert len(calls) >= 2
    totals = [c[0] for c in calls]
    assert pairs in totals and runs in totals
    # the device-side min-length filter recorded its kept count too, and
    # the repeat call sized the kept wire from it
    assert kept is not None and 0 < kept <= runs
    assert kept in totals


def test_choose_seed_k_sparse_policy():
    from slamem_tpu.engine.seed_mode import choose_seed_k_sparse

    # headline (5 Mbp, L=20): K = L-7 = 13 -> stride 8 (r3 measured optimum
    # after the carried-validity pack + paired direct-table gather)
    assert choose_seed_k_sparse(5_000_000, 5_000_000, 20, 32) == 13
    # chr21 (40 Mbp, L=50): direct-addressable K=14 (zero-probe buckets),
    # sampled noise ~430K well within one round
    assert choose_seed_k_sparse(40_000_000, 40_000_000, 50, 32) == 14
    # chr1-scale: K=14 noise ~3.3M still under the 4M direct budget
    assert choose_seed_k_sparse(250_000_000, 50_000_000, 50, 32) == 14
    # direct table gated by 4^14 <= 64n: small genome at L=50 keeps K=16
    assert choose_seed_k_sparse(1_000_000, 1_000_000, 50, 32) == 16
    # cap below 14 skips the direct preference
    assert choose_seed_k_sparse(40_000_000, 40_000_000, 50, 13) == 13
    # truly collision-flooded single word escalates to two
    assert choose_seed_k_sparse(3_000_000_000, 3_000_000_000, 50, 32) == 32
    # cap respected
    assert choose_seed_k_sparse(250_000_000, 50_000_000, 50, 12) == 12
    # short L keeps K >= 8
    assert choose_seed_k_sparse(1000, 1000, 10, 32) == 8


def test_mode_filter_containment_adversarial():
    """Run-containment uniqueness (apply_mode_filter) vs oracle on inputs
    built to stress it: tandem repeats (nested intervals), exact duplicate
    intervals (two ref occurrences with identical query extents), and a
    triple-occurrence string; sparse seeding forced on and off."""
    ref = random_genome(3000, seed=501)
    ref[1000:1100] = ref[200:300]            # duplicate (MAM killer)
    ref[2000:2100] = ref[200:300]            # triplicate
    ref[1500:1560] = ref[1520:1580]          # overlapping self-copy (tandem)
    qry = mutate(ref, 0.01, 0.001, seed=502)
    qry = np.concatenate([qry, qry[240:320]])  # query-side duplication
    for mode in (MatchMode.MEM, MatchMode.MAM, MatchMode.MUM):
        for sparse in ("auto", "off"):
            check(ref, qry, Config(min_length=14, mode=mode,
                                   sparse_seeds=sparse))


def test_mode_filter_sparse_path_used():
    """MUM/MAM now ride sparse seeding (stride > 1) — assert the plan says
    so and the result still matches the oracle."""
    from slamem_tpu.engine.seed_mode import choose_seed_plan

    cfg = Config(min_length=20, mode=MatchMode.MAM)
    _k, stride, sparse = choose_seed_plan(1_000_000, 100_000, cfg)
    assert sparse and stride > 1
    ref = random_genome(5000, seed=511)
    ref[3000:3200] = ref[500:700]
    qry = mutate(ref, 0.012, 0.001, seed=512)
    check(ref, qry, Config(min_length=20, mode=MatchMode.MAM))
    check(ref, qry, Config(min_length=20, mode=MatchMode.MUM))


def test_unique_intervals_unit():
    from slamem_tpu.engine.seed_mode import _unique_intervals

    s = np.array([0, 0, 5, 6, 6, 10, 20])
    e = np.array([9, 9, 8, 8, 7, 15, 30])
    # [0,9] twin x2 -> both contained by each other; [5,8] inside [0,9];
    # [6,8] inside [5,8]; [6,7] inside; [10,15] overlaps [0,9]? no (10>9),
    # not contained; [20,30] free
    got = _unique_intervals(s, e)
    assert got.tolist() == [False, False, False, False, False, True, True]
    assert _unique_intervals(np.array([], np.int64),
                             np.array([], np.int64)).size == 0
    # containment strictly by interval, not adjacency
    s2 = np.array([0, 1]); e2 = np.array([5, 6])
    assert _unique_intervals(s2, e2).tolist() == [True, True]


def test_split_expansion_equivalence_and_overflow(monkeypatch):
    """Repeat calls flip to the split expansion (pairs ~ samples); results
    stay oracle-exact. A forced split overflow falls back to the
    multi-round recompute, blocks the key, and later calls stay correct."""
    from slamem_tpu.engine import seed_mode

    ref = random_genome(6000, seed=601)
    qry = mutate(ref, 0.01, 0.001, seed=602)
    cfg = Config(min_length=16)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    want = oracle_tuples(ref, qry, cfg)
    split_seen = []
    for _ in range(3):
        m = find_seed_matches(index, np.asarray(qry, np.uint8), cfg)
        assert sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                          m.length.tolist())) == want
        split_seen.append(bool(m.stats and m.stats.get("split")))
    assert split_seen[0] is False and split_seen[-1] is True

    # force an overflow inside the split path: every call reports discard
    real = seed_mode._expand_pairs_split

    def always_overflow(sa_aug, lo, width, m_off, rk, rc, stride=1):
        d, q, _ = real(sa_aug, lo, width, m_off, rk, rc, stride)
        import jax.numpy as jnp
        return d, q, jnp.bool_(True)

    seed_mode._split_blocklist.clear()
    monkeypatch.setattr(seed_mode, "_expand_pairs_split", always_overflow)
    seed_mode.fused_query.clear_cache()  # retrace picks up the patch
    seed_mode.fused_query_bucket.clear_cache()
    fused_query_cache_buster = Config(min_length=16, pair_capacity_max=1 << 21)
    m1 = find_seed_matches(index, np.asarray(qry, np.uint8),
                           fused_query_cache_buster)
    m2 = find_seed_matches(index, np.asarray(qry, np.uint8),
                           fused_query_cache_buster)  # split on, overflows
    monkeypatch.undo()
    seed_mode.fused_query.clear_cache()   # drop traces of the patched fn
    seed_mode.fused_query_bucket.clear_cache()
    got2 = sorted(zip(m2.refpos.tolist(), m2.qpos.tolist(),
                      m2.length.tolist()))
    assert got2 == want
    assert any(key[0] == id(index.sa) for key in seed_mode._split_blocklist)
    m3 = find_seed_matches(index, np.asarray(qry, np.uint8),
                           fused_query_cache_buster)  # blocked: plain path
    got3 = sorted(zip(m3.refpos.tolist(), m3.qpos.tolist(),
                      m3.length.tolist()))
    assert got3 == want and not (m3.stats or {}).get("split")

