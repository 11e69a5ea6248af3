"""LCP array, PSV/NSV pyramid, and scan-engine parity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from slamem_tpu.config import Config, MatchMode
from slamem_tpu.engine.scan_mode import find_scan_matches, scan_intervals
from slamem_tpu.engine.seed_mode import (
    apply_mode_filter, find_seed_matches, packed_kmers, seed_intervals,
    seed_table)
from slamem_tpu.index.build import build_index
from slamem_tpu.index.lcp import lcp_adjacent
from slamem_tpu.kernels.lcp_search import LcpPyramid, expand, nsv, psv
from slamem_tpu.io import str_to_codes
from slamem_tpu.oracle import oracle_matches
from slamem_tpu.utils.synth import mutate, random_genome, with_n_runs


def naive_lcp_pair(text, x, y):
    h = 0
    n = len(text)
    while (x + h < n and y + h < n and text[x + h] == text[y + h]
           and text[x + h] < 4):
        h += 1
    return h


def test_lcp_matches_naive():
    rng = np.random.default_rng(60)
    for trial in range(6):
        n = int(rng.integers(10, 400))
        t = rng.integers(0, 3, size=n).astype(np.uint8)  # alphabet 3: repeats
        if trial % 2:
            t[rng.integers(0, n, size=max(1, n // 15))] = 4
        idx = build_index(t)
        lcp = np.asarray(lcp_adjacent(idx.text, idx.sa))
        sa = np.asarray(idx.sa)
        text = np.asarray(idx.text)
        assert lcp[0] == 0
        for j in range(1, idx.n):
            assert lcp[j] == naive_lcp_pair(text, sa[j - 1], sa[j]), (trial, j)


def test_psv_nsv_vs_naive():
    rng = np.random.default_rng(61)
    lcp = rng.integers(0, 12, size=700).astype(np.int32)
    lcp[0] = 0
    pyr = LcpPyramid.build(jnp.asarray(lcp))
    ext = np.concatenate(([-1], lcp[1:], [-1]))  # pyramid's view
    js = rng.integers(0, 701, size=128).astype(np.int32)
    vs = rng.integers(0, 13, size=128).astype(np.int32)
    got_p = np.asarray(psv(pyr, jnp.asarray(js), jnp.asarray(vs)))
    got_n = np.asarray(nsv(pyr, jnp.asarray(js), jnp.asarray(vs)))
    for j, v, gp, gn in zip(js, vs, got_p, got_n):
        wp = max(i for i in range(j + 1) if ext[i] < v)
        wn = min(i for i in range(j, 701) if ext[i] < v)
        assert gp == wp, (j, v, gp, wp)
        assert gn == wn, (j, v, gn, wn)


def test_expand_gives_depth_interval():
    # interval of "ACG" expanded at v=2 must equal the interval of "AC"
    t = str_to_codes("ACGTACGTACATACGACC")
    idx = build_index(t)
    from slamem_tpu.index.lcp import lcp_adjacent as la

    pyr = LcpPyramid.build(la(idx.text, idx.sa))
    refk3, _ = seed_table(idx, 3)
    qk3, qv3 = packed_kmers(jnp.asarray(str_to_codes("ACG")), 3)
    lo3, w3 = seed_intervals(refk3, qk3[:1], qv3[:1])
    refk2, _ = seed_table(idx, 2)
    qk2, qv2 = packed_kmers(jnp.asarray(str_to_codes("AC")), 2)
    lo2, w2 = seed_intervals(refk2, qk2[:1], qv2[:1])
    el, er = expand(pyr, lo3.astype(jnp.int32),
                    (lo3 + w3).astype(jnp.int32),
                    jnp.full((1,), 2, jnp.int32))
    assert int(el[0]) == int(lo2[0])
    assert int(er[0]) == int(lo2[0] + w2[0])


def test_scan_intervals_match_seed_intervals():
    ref = random_genome(1500, seed=62)
    qry = mutate(ref, 0.02, 0.002, seed=63)
    L = 12
    idx = build_index(ref)
    refk, _ = seed_table(idx, L)
    qk, qv = packed_kmers(jnp.asarray(qry, jnp.uint8), L)
    lo_s, w_s = seed_intervals(refk, qk, qv)
    lo_c, w_c = scan_intervals(idx, qry, L, lane_block=64)
    w_s, w_c = np.asarray(w_s), np.asarray(w_c)
    assert np.array_equal(w_s, w_c)
    # lo only meaningful where width > 0
    sel = w_s > 0
    assert np.array_equal(np.asarray(lo_s)[sel], np.asarray(lo_c)[sel])


def test_scan_engine_oracle_parity():
    ref = with_n_runs(random_genome(1200, seed=64), 3, 20, seed=65)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=66), 2, 15, seed=67)
    cfg = Config(min_length=11, engine="scan")
    idx = build_index(ref)
    m = apply_mode_filter(find_scan_matches(idx, qry, cfg), cfg)
    got = sorted(zip(m.refpos.tolist(), m.qpos.tolist(), m.length.tolist()))
    want = sorted(oracle_matches(ref, qry, 11, "mem"))
    assert got == want


@pytest.mark.parametrize("L,mode", [(9, MatchMode.MEM), (40, MatchMode.MEM),
                                    (12, MatchMode.MUM)])
def test_scan_equals_seed(L, mode):
    """Both engines must produce identical matches for any L and mode."""
    ref = random_genome(2500, seed=68)
    qry = mutate(ref, 0.015, 0.0015, seed=69)
    idx = build_index(ref)
    cfg_seed = Config(min_length=L, mode=mode, engine="seed")
    cfg_scan = Config(min_length=L, mode=mode, engine="scan")
    a = apply_mode_filter(find_seed_matches(idx, qry, cfg_seed), cfg_seed)
    b = apply_mode_filter(find_scan_matches(idx, qry, cfg_scan), cfg_scan)
    ta = sorted(zip(a.refpos.tolist(), a.qpos.tolist(), a.length.tolist()))
    tb = sorted(zip(b.refpos.tolist(), b.qpos.tolist(), b.length.tolist()))
    assert ta == tb and len(ta) > 0


def test_scan_chunked_equals_monolithic(monkeypatch):
    """Chunked chr-scale scan (L-overlap segments) == one-dispatch scan ==
    seed engine. The chunk width is forced tiny so a small input exercises
    several segments including the padded tail."""
    from slamem_tpu.engine import scan_mode
    from slamem_tpu.engine.seed_mode import find_seed_matches

    ref = random_genome(20_000, seed=771)
    qry = mutate(ref, 0.02, 0.002, seed=772)
    idx = build_index(ref)
    cfg = Config(min_length=12)

    def tup(m):
        return sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                          m.length.tolist()))

    want = tup(scan_mode.find_scan_matches(idx, qry, cfg))
    monkeypatch.setattr(scan_mode, "_SCAN_CHUNK", 4096)
    got = tup(scan_mode.find_scan_matches(idx, qry, cfg))
    assert got == want and len(want) > 0
    assert tup(find_seed_matches(idx, qry, cfg)) == want
