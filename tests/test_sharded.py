"""SA-rank-sharded index tests (BASELINE config #5) on the fake CPU mesh."""

import numpy as np

from slamem_tpu.config import Config, MatchMode
from slamem_tpu.dist.mesh import make_mesh
from slamem_tpu.dist.sharded import find_seed_matches_sharded
from slamem_tpu.engine.seed_mode import find_seed_matches
from slamem_tpu.index.build import build_index
from slamem_tpu.utils.synth import mutate, random_genome, with_n_runs


def tuples(m):
    return sorted(zip(m.refpos.tolist(), m.qpos.tolist(), m.length.tolist()))


def test_sharded_equals_replicated():
    ref = with_n_runs(random_genome(4000, seed=81), 2, 40, seed=82)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=83), 2, 30, seed=84)
    cfg = Config(min_length=14, pair_capacity=512)
    idx = build_index(ref)
    mesh = make_mesh(8)
    got = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
    want = tuples(find_seed_matches(idx, qry, cfg))
    assert got == want and len(want) > 0


def test_sharded_direct_table_top_bucket_pads():
    """Slab pads share the top direct-table bucket with real all-T K-mers.

    n chosen NOT divisible by 8 so the last slab carries uint32-max pad
    rows; the reference ends in a long T run so the all-T K-mer (the
    largest real key, clamped into the same bucket as the pads by
    _build_bucket_table) has genuine matches. Pads must be dropped by
    their invalid sa_aug, not change any interval."""
    body = random_genome(4001, seed=85)
    ref = np.concatenate([body, np.full(63, 3, body.dtype)])  # trailing T*63
    qry = np.concatenate([mutate(body, 0.02, 0.002, seed=86),
                          np.full(40, 3, body.dtype)])
    idx = build_index(ref)
    mesh = make_mesh(8)
    assert idx.n % 8 != 0  # pads exist
    want = tuples(find_seed_matches(idx, qry, Config(min_length=14)))
    for fe in ("bucket", "join"):
        cfg = Config(min_length=14, pair_capacity=512, frontend=fe)
        got = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
        assert got == want and len(want) > 0


def test_sharded_frontends_identical():
    """Per-slab sort join == per-slab bucket probes == replicated path."""
    ref = with_n_runs(random_genome(4000, seed=81), 2, 40, seed=82)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=83), 2, 30, seed=84)
    idx = build_index(ref)
    mesh = make_mesh(8)
    want = tuples(find_seed_matches(idx, qry, Config(min_length=14)))
    for fe in ("join", "bucket"):
        cfg = Config(min_length=14, pair_capacity=512, frontend=fe)
        got = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
        assert got == want and len(want) > 0


def test_sharded_run_across_slab_boundary():
    # an identical pair → one giant match whose SA rows spread over all slabs
    ref = random_genome(2000, seed=85)
    qry = ref.copy()
    cfg = Config(min_length=1500)
    idx = build_index(ref)
    mesh = make_mesh(8)
    got = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
    assert got == [(0, 0, 2000)]


def test_sharded_unique_modes_parity():
    """MUM/MAM on the sharded index match the replicated path exactly."""
    from slamem_tpu.engine.seed_mode import apply_mode_filter

    ref = with_n_runs(random_genome(3000, seed=86), 2, 30, seed=87)
    # tandem duplication manufactures non-unique matches for the filters
    ref = np.concatenate([ref, ref[500:900]])
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=88), 2, 20, seed=89)
    idx = build_index(ref)
    mesh = make_mesh(8)
    for mode in (MatchMode.MAM, MatchMode.MUM):
        cfg = Config(min_length=14, mode=mode, pair_capacity=512)
        got = apply_mode_filter(
            find_seed_matches_sharded(idx, qry, cfg, mesh), cfg)
        want = apply_mode_filter(find_seed_matches(idx, qry, cfg), cfg)
        assert tuples(got) == tuples(want)
        assert len(tuples(want)) > 0


def test_sharded_two_word_seeds_parity(monkeypatch):
    """Sharded slab search with dual-word K<=32 keys == replicated path."""
    from slamem_tpu.engine import seed_mode

    # choose_seed_plan is the ONE shared policy entry point (both engines
    # route through it), so forcing the depth patches only seed_mode; both
    # the dense and sparse choosers are forced so the MEM default (sparse)
    # really runs dual-word keys (L=24 -> stride 1 via choose_stride)
    force = lambda n, m, L, cap: min(L, cap)
    monkeypatch.setattr(seed_mode, "choose_seed_k", force)
    monkeypatch.setattr(seed_mode, "choose_seed_k_sparse", force)
    ref = with_n_runs(random_genome(5000, seed=90), 2, 40, seed=91)
    qry = with_n_runs(mutate(ref, 0.015, 0.0015, seed=92), 2, 25, seed=93)
    cfg = Config(min_length=24, pair_capacity=512)
    idx = build_index(ref)
    mesh = make_mesh(8)
    got = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
    want = tuples(find_seed_matches(idx, qry, cfg))
    assert got == want and len(want) > 0


def test_sharded_one_device_delegates_to_fused():
    """A 1-slab mesh routes through the replicated fused engine (identical
    matches; the slab view is the whole table, DESIGN.md §5c)."""
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist.sharded import find_seed_matches_sharded
    from slamem_tpu.engine.seed_mode import find_seed_matches

    ref = random_genome(4000, seed=91)
    qry = mutate(ref, 0.02, 0.002, seed=92)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    cfg = Config(min_length=14)
    mesh = make_mesh(1)
    a = find_seed_matches_sharded(index, np.asarray(qry, np.uint8), cfg,
                                  mesh)
    b = find_seed_matches(index, np.asarray(qry, np.uint8), cfg)
    ta = sorted(zip(a.refpos.tolist(), a.qpos.tolist(), a.length.tolist()))
    tb = sorted(zip(b.refpos.tolist(), b.qpos.tolist(), b.length.tolist()))
    assert ta == tb and len(ta) > 0


# ---------------------------------------------------------------------------
# Virtual slabs: the multi-slab program on ONE device (VERDICT r4 #1)
# ---------------------------------------------------------------------------

def test_virtual_slabs_equal_replicated():
    """n_slabs > 1 on a single device: per-slab ranged tables + slab
    frontends + merge must reproduce the replicated match set exactly,
    across slab counts that do and do not divide n."""
    ref = with_n_runs(random_genome(64_000, seed=181), 2, 60, seed=182)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=183), 2, 40, seed=184)
    idx = build_index(ref)
    want = None
    for n_slabs in (2, 3, 8):
        cfg = Config(min_length=14)
        m = find_seed_matches_sharded(idx, qry, cfg, None, n_slabs=n_slabs)
        got = tuples(m)
        if want is None:
            want = tuples(find_seed_matches(idx, qry, cfg))
        assert got == want and len(want) > 0
        assert m.stats["shards"] == n_slabs
        assert m.stats["virtual_slabs"] is True
        assert m.stats["pairs"] > 0


def test_virtual_slabs_equal_mesh_sharded():
    """8 virtual slabs on one device == 8 mesh slabs on the fake mesh
    (same program, different placement), run-capacity overflow included."""
    ref = with_n_runs(random_genome(8_000, seed=281), 2, 40, seed=282)
    qry = with_n_runs(mutate(ref, 0.02, 0.002, seed=283), 2, 30, seed=284)
    idx = build_index(ref)
    mesh = make_mesh(8)
    cfg = Config(min_length=14, pair_capacity=512)  # forces multi-round
    got_v = tuples(find_seed_matches_sharded(idx, qry, cfg, None, n_slabs=8))
    got_m = tuples(find_seed_matches_sharded(idx, qry, cfg, mesh))
    assert got_v == got_m and len(got_m) > 0


def test_virtual_slabs_modes_and_deep_minlen():
    """MUM/MAM containment filter and the deep-minlen strided extension run
    unchanged over virtually-sharded match sets."""
    from slamem_tpu.engine.seed_mode import apply_mode_filter

    ref = random_genome(30_000, seed=381)
    qry = mutate(ref, 0.01, 0.001, seed=382)
    idx = build_index(ref)
    for minlen in (14, 40):
        for mode in (MatchMode.MEM, MatchMode.MUM, MatchMode.MAM):
            cfg = Config(min_length=minlen, mode=mode)
            want = tuples(apply_mode_filter(
                find_seed_matches(idx, qry, cfg), cfg))
            got = tuples(apply_mode_filter(
                find_seed_matches_sharded(idx, qry, cfg, None, n_slabs=4),
                cfg))
            assert got == want
            if mode is MatchMode.MEM:
                assert len(want) > 0


def test_virtual_slabs_mesh_mismatch_raises():
    import pytest

    ref = random_genome(4000, seed=481)
    idx = build_index(ref)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="must equal the device count"):
        find_seed_matches_sharded(idx, ref[:1000], Config(min_length=14),
                                  mesh, n_slabs=4)


def test_virtual_hints_persist_and_correct(tmp_path, monkeypatch):
    """Virtual-slab buffer hints round-trip through the adaptive disk
    store, and an adversarially-poisoned record is corrected by the
    growth loop (hints never affect correctness)."""
    import importlib

    from slamem_tpu.engine import adaptive
    from slamem_tpu.dist import sharded

    monkeypatch.setenv("SLAMEM_ADAPTIVE_DISK", "1")
    monkeypatch.setattr(adaptive, "_DISABLED", False)
    monkeypatch.setattr(adaptive, "_PATH", str(tmp_path / "adaptive.json"))
    monkeypatch.setattr(adaptive, "_store", None)

    ref = random_genome(30_000, seed=991)
    qry = mutate(ref, 0.02, 0.002, seed=992)
    idx = build_index(ref)
    cfg = Config(min_length=20)
    want = tuples(find_seed_matches(idx, qry, cfg))
    got = tuples(find_seed_matches_sharded(idx, qry, cfg, None, n_slabs=4))
    assert got == want
    # a record was persisted
    recs = {k: v for k, v in adaptive._load().items()
            if k.startswith("virt|")}
    assert len(recs) == 1
    (disk_key, rec), = recs.items()
    assert rec["frag"] > 0 and rec["kept"] >= 0

    # poison the stored hint and clear the in-RAM cache: the engine must
    # still produce the exact set (growth loop corrects) and rewrite it
    adaptive.put(disk_key, {"frag": 1, "kept": 1})
    sharded._virtual_last.clear()
    got2 = tuples(find_seed_matches_sharded(idx, qry, cfg, None,
                                            n_slabs=4))
    assert got2 == want
    assert adaptive._load()[disk_key] == rec


def test_virtual_slabs_class_spanning_many_slabs():
    """Owner routing's interior-slab case: a K-mer class larger than a
    slab (poly-A run) spans several slabs entirely — interior slabs'
    intervals are the whole slab and expansion must still be exact."""
    rng = np.random.default_rng(77)
    ref = np.concatenate([
        rng.integers(0, 4, 2_000).astype(np.uint8),
        np.zeros(24_000, np.uint8),             # poly-A >> slab size
        rng.integers(0, 4, 2_000).astype(np.uint8)])
    qry = np.concatenate([
        rng.integers(0, 4, 500).astype(np.uint8),
        np.zeros(3_000, np.uint8),              # query A-run
        mutate(ref[:4_000], 0.02, 0.002, seed=78)])
    idx = build_index(ref)
    for minlen in (14, 40):
        cfg = Config(min_length=minlen)
        want = tuples(find_seed_matches(idx, qry, cfg))
        for n_slabs in (4, 8):
            got = tuples(find_seed_matches_sharded(idx, qry, cfg, None,
                                                   n_slabs=n_slabs))
            assert got == want and len(want) > 0, (minlen, n_slabs)


def test_virtual_slabs_more_slabs_than_rows_edge():
    """Degenerate layouts (tiny reference, slab count near/above the row
    count -> fully-padded slabs whose ranged tables hold only pad rows)
    must stay exact via the invalid-sa contract."""
    ref = random_genome(300, seed=661)
    qry = mutate(ref, 0.02, 0.0, seed=662)
    idx = build_index(ref)
    cfg = Config(min_length=10)
    want = tuples(find_seed_matches(idx, qry, cfg))
    assert len(want) > 0
    for n_slabs in (7, 64, 301):
        got = tuples(find_seed_matches_sharded(idx, qry, cfg, None,
                                               n_slabs=n_slabs))
        assert got == want, n_slabs
