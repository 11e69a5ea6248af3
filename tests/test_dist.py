"""Distributed-path tests on the fake 8-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import jax

from slamem_tpu.config import Config
from slamem_tpu.dist.mesh import make_mesh, put_replicated
from slamem_tpu.engine.run import run_engine
from slamem_tpu.engine.seed_mode import find_seed_matches
from slamem_tpu.index.build import build_index
from slamem_tpu.io import FastaSet
from slamem_tpu.report.format import format_matches
from slamem_tpu.utils.synth import mutate, random_genome


def tuples(m):
    return sorted(zip(m.refpos.tolist(), m.qpos.tolist(), m.length.tolist()))


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_equal_single():
    ref = random_genome(3000, seed=51)
    qry = mutate(ref, 0.02, 0.002, seed=52)
    cfg = Config(min_length=12, pair_capacity=256, position_block=100)
    index = build_index(ref)
    single = tuples(find_seed_matches(index, qry, cfg))
    mesh = make_mesh(8)
    index_r = put_replicated(index, mesh)
    sharded = tuples(find_seed_matches(index_r, qry, cfg, mesh=mesh))
    assert sharded == single
    assert len(single) > 0


def test_sharded_run_crossing_shard_boundary():
    # one long identical match must reassemble across many tiny blocks/shards
    ref = random_genome(1200, seed=53)
    qry = ref.copy()
    cfg = Config(min_length=1000, pair_capacity=64, position_block=29)
    mesh = make_mesh(8)
    index = put_replicated(build_index(ref), mesh)
    m = find_seed_matches(index, qry, cfg, mesh=mesh)
    assert tuples(m) == [(0, 0, 1200)]


def test_full_pipeline_bytes_identical_on_mesh():
    ref = random_genome(2500, seed=55)
    qry = mutate(ref, 0.015, 0.001, seed=56)
    ref_set = FastaSet(names=["R"], starts=np.array([0]),
                       lengths=np.array([len(ref)]), codes=ref)
    q_set = FastaSet(names=["Q"], starts=np.array([0]),
                     lengths=np.array([len(qry)]), codes=qry)
    cfg = Config(min_length=15, pair_capacity=512, both_strands=True)
    out1 = run_engine(ref_set, q_set, cfg)
    mesh = make_mesh(8)
    out2 = run_engine(ref_set, q_set, cfg, mesh=mesh)
    assert format_matches(out1) == format_matches(out2)


def test_graft_entry_singlechip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out1 = jax.jit(fn)(*args)
    d_s, q_s = out1
    assert d_s.shape[0] > 0 and d_s.shape == q_s.shape


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
