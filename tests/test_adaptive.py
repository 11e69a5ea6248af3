"""Byte-budgeted device caches + persistent adaptive-shape state.

VERDICT r3 missing #3 (count-based eviction pinned multi-GB tables and
OOM'ed the bench) and #1 (cold process dispatches three shape families):
the fixes live in utils/devcache.py and engine/adaptive.py; these tests
pin their contracts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from slamem_tpu.config import Config
from slamem_tpu.engine import adaptive, seed_mode
from slamem_tpu.index.build import build_index, index_digest
from slamem_tpu.utils import devcache
from slamem_tpu.utils.devcache import DevCache, clear_device_caches
from slamem_tpu.utils.synth import strain_pair


class TestDevCache:
    def test_identity_guard_and_hit(self):
        c = DevCache("t1")
        owner = jnp.arange(4)
        put_val = c.put("k", owner, ("v", jnp.zeros(8)))
        hit = c.get("k", owner)
        assert hit is put_val and hit[0] == "v"
        other = jnp.arange(4)
        assert c.get("k", other) is None       # different owner array

    def test_byte_budget_evicts_lru(self, monkeypatch):
        monkeypatch.setattr(devcache, "_BUDGET_BYTES", 10_000)
        c = DevCache("t2")
        owners = [jnp.arange(4) for _ in range(4)]
        for i, o in enumerate(owners):
            c.put(i, o, jnp.zeros(1024, jnp.int32))   # 4 KB each
        # budget holds 2 entries; the most recent survive
        assert c.get(0, owners[0]) is None
        assert c.get(1, owners[1]) is None
        assert c.get(3, owners[3]) is not None
        # a single oversized entry still inserts (never evicts itself)
        big_owner = jnp.arange(4)
        c.put("big", big_owner, jnp.zeros(8192, jnp.int32))  # 32 KB
        assert c.get("big", big_owner) is not None

    def test_dead_owner_purged(self):
        c = DevCache("t3")
        owner = np.arange(4)
        c.put("k", owner, jnp.zeros(16))
        del owner
        assert c.get("k", np.arange(4)) is None
        assert "k" not in c._d                 # purged, not just missed

    def test_clear_device_caches(self):
        c = DevCache("t4")
        owner = jnp.arange(4)
        c.put("k", owner, jnp.zeros(16))
        clear_device_caches()
        assert c.total_bytes() == 0


class TestAdaptiveDisk:
    @pytest.fixture()
    def disk(self, tmp_path, monkeypatch):
        monkeypatch.setattr(adaptive, "_DISABLED", False)
        monkeypatch.setattr(adaptive, "_PATH", str(tmp_path / "a.json"))
        monkeypatch.setattr(adaptive, "_store", None)
        return tmp_path / "a.json"

    def test_roundtrip_and_reload(self, disk, monkeypatch):
        rec = {"pairs": 7, "runs": 3, "kept": 2, "nonzero": 6,
               "split_blocked": False}
        adaptive.put("key1", rec)
        assert adaptive.get("key1") == rec
        monkeypatch.setattr(adaptive, "_store", None)  # fresh "process"
        assert adaptive.get("key1") == rec
        assert disk.read_text().endswith("\n")

    def test_seed_last_from_disk_populates_memory(self, disk):
        ref, qry = strain_pair(20_000, seed=3, sub_rate=0.01,
                               indel_rate=0.001)
        index = build_index(ref)
        k, stride, m_p = 13, 8, len(qry)
        dk = adaptive.record_key(index_digest(index), k, stride, m_p,
                                 adaptive.query_fingerprint(qry))
        adaptive.put(dk, {"pairs": 123, "runs": 45, "kept": 40,
                          "nonzero": 100, "split_blocked": True})
        memkey = (id(index.sa), k, stride)
        seed_mode._last_total_cache.pop(memkey, None)
        seed_mode._split_blocklist.discard(memkey)
        seed_mode.seed_last_from_disk(index, k, stride, m_p, qry)
        assert seed_mode._last_total(index, k, stride) == (123, 45, 40)
        assert seed_mode._last_nonzero(index, k, stride) == 100
        assert memkey in seed_mode._split_blocklist
        seed_mode._split_blocklist.discard(memkey)

    def test_cold_process_plans_converged_shapes(self, disk):
        """The rc=124 fix: with a disk record, a fresh memory state plans
        the same (snapped) shape family a warm process would."""
        ref, qry = strain_pair(200_000, seed=5, sub_rate=0.015,
                               indel_rate=0.0015)
        index = build_index(ref)
        cfg = Config(min_length=20)
        m_p = int(seed_mode.pad_query(qry).shape[0])
        seed_mode.find_seed_matches(index, qry, cfg)
        warm = seed_mode.plan_fused(index, m_p, cfg, qry)
        assert warm.capacity < int(cfg.pair_capacity)  # actually snapped
        # simulate a cold process: drop in-memory state, keep the disk
        k, stride = warm.k, warm.stride
        seed_mode._last_total_cache.pop((id(index.sa), k, stride), None)
        cold = seed_mode.plan_fused(index, m_p, cfg, qry)
        assert cold == warm

    def test_write_through_on_observation(self, disk):
        ref, qry = strain_pair(100_000, seed=7, sub_rate=0.015,
                               indel_rate=0.0015)
        index = build_index(ref)
        cfg = Config(min_length=20)
        seed_mode.find_seed_matches(index, qry, cfg)
        m_p = int(seed_mode.pad_query(qry).shape[0])
        k, stride, _ = seed_mode.choose_seed_plan(index.n, m_p, cfg)
        dk = adaptive.record_key(index_digest(index), k, stride, m_p,
                                 adaptive.query_fingerprint(qry),
                                 int(cfg.min_length))
        rec = adaptive.get(dk)
        assert rec is not None and rec["pairs"] > 0

    def test_stale_record_is_harmless(self, disk):
        """A wrong disk record mis-sizes buffers; results stay exact."""
        ref, qry = strain_pair(100_000, seed=9, sub_rate=0.015,
                               indel_rate=0.0015)
        index = build_index(ref)
        cfg = Config(min_length=20)
        m_p = int(seed_mode.pad_query(qry).shape[0])
        k, stride, _ = seed_mode.choose_seed_plan(index.n, m_p, cfg)
        dk = adaptive.record_key(index_digest(index), k, stride, m_p,
                                 adaptive.query_fingerprint(qry),
                                 int(cfg.min_length))
        # absurdly small prediction: every buffer under-sized
        adaptive.put(dk, {"pairs": 8, "runs": 4, "kept": 2, "nonzero": 6,
                          "split_blocked": False})
        seed_mode._last_total_cache.pop((id(index.sa), k, stride), None)
        got = seed_mode.find_seed_matches(index, qry, cfg)
        # reference answer with a clean state
        seed_mode._split_blocklist.discard((id(index.sa), k, stride))
        want = seed_mode.find_seed_matches(index, qry, cfg)
        t_got = sorted(zip(np.asarray(got.refpos).tolist(),
                           np.asarray(got.qpos).tolist(),
                           np.asarray(got.length).tolist()))
        t_want = sorted(zip(np.asarray(want.refpos).tolist(),
                            np.asarray(want.qpos).tolist(),
                            np.asarray(want.length).tolist()))
        assert t_got == t_want


def test_digest_survives_index_save_load(tmp_path):
    """save/load round-trips register the same content digest, so a
    process that -loads a checkpointed index hits the same adaptive-disk
    records the building process wrote."""
    from slamem_tpu.index.serialize import load_index, save_index

    ref, _ = strain_pair(20_000, seed=11, sub_rate=0.01, indel_rate=0.001)
    built = build_index(ref)
    path = str(tmp_path / "idx.npz")
    save_index(path, built)
    loaded = load_index(path)
    assert index_digest(loaded) == index_digest(built)


def test_adaptive_store_bounded_and_merged(tmp_path, monkeypatch):
    """put() evicts oldest past _MAX_RECORDS and merges concurrent
    writers' records instead of last-writer-wins clobbering (ADVICE r4)."""
    import json

    from slamem_tpu.engine import adaptive

    monkeypatch.setattr(adaptive, "_DISABLED", False)
    monkeypatch.setattr(adaptive, "_PATH", str(tmp_path / "a.json"))
    monkeypatch.setattr(adaptive, "_store", None)
    monkeypatch.setattr(adaptive, "_MAX_RECORDS", 10)
    for i in range(15):
        adaptive.put(f"k{i}", {"v": i})
    disk = json.load(open(adaptive._PATH))
    assert len(disk) == 10
    assert "k0" not in disk and "k14" in disk     # oldest evicted

    # a concurrent process wrote a record after our load: merge keeps it
    disk["other"] = {"v": 99}
    with open(adaptive._PATH, "w") as f:
        json.dump(disk, f)
    adaptive.put("k20", {"v": 20})
    disk2 = json.load(open(adaptive._PATH))
    assert disk2["other"] == {"v": 99} and disk2["k20"] == {"v": 20}

    # re-putting an existing key refreshes recency
    adaptive.put("k14", {"v": 140})
    for i in range(30, 38):
        adaptive.put(f"k{i}", {"v": i})
    disk3 = json.load(open(adaptive._PATH))
    assert disk3["k14"] == {"v": 140}
