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


def test_two_process_multihost_cli(tmp_path):
    """REAL multi-host evidence (no pod needed): two OS processes join via
    jax.distributed over localhost, each with 4 fake CPU devices, and run
    the CLI SPMD on the global 8-device mesh. Only process 0 may write the
    listing, and its bytes must equal a plain single-process run."""
    import os
    import subprocess
    import sys

    from slamem_tpu.io import Sequence, write_fasta
    from slamem_tpu.utils.synth import mutate, random_genome

    ref = random_genome(3000, seed=901)
    qry = mutate(ref, 0.02, 0.002, seed=902)
    rp, qp = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, [Sequence("Q", qry)])

    base = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4")
    for bad in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        base.pop(bad, None)

    single = tmp_path / "single.txt"
    r = subprocess.run(
        [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
         "-o", str(single), rp, qp],
        capture_output=True, text=True, env=base)
    assert r.returncode == 0, r.stderr[-1500:]

    outs = [tmp_path / "p0.txt", tmp_path / "p1.txt"]
    procs = []
    for i in range(2):
        env = dict(base, JAX_COORDINATOR_ADDRESS="localhost:23981",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
             "-o", str(outs[i]), rp, qp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for i, p in enumerate(procs):
        _, err = p.communicate(timeout=480)
        assert p.returncode == 0, (i, err[-1500:])
    assert outs[0].exists(), "process 0 must emit the listing"
    assert not outs[1].exists(), "process 1 must stay silent"
    assert outs[0].read_text() == single.read_text()


def test_two_process_multihost_cli_sharded(tmp_path):
    """REAL multi-host evidence for the SHARDED path (config #5): two OS
    processes join via jax.distributed, the SA-rank slabs split across the
    global 8-device mesh (4 per process), the run-triple merge rides
    all_gather, and process 0's bytes equal a plain single-process run."""
    import os
    import subprocess
    import sys

    from slamem_tpu.io import Sequence, write_fasta
    from slamem_tpu.utils.synth import mutate, random_genome

    ref = random_genome(3000, seed=911)
    qry = mutate(ref, 0.02, 0.002, seed=912)
    rp, qp = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, [Sequence("Q", qry)])

    base = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=4")
    for bad in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        base.pop(bad, None)

    single = tmp_path / "single.txt"
    r = subprocess.run(
        [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
         "-o", str(single), rp, qp],
        capture_output=True, text=True, env=base)
    assert r.returncode == 0, r.stderr[-1500:]

    outs = [tmp_path / "p0.txt", tmp_path / "p1.txt"]
    procs = []
    for i in range(2):
        env = dict(base, JAX_COORDINATOR_ADDRESS="localhost:23982",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
             "-shard", "-o", str(outs[i]), rp, qp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for i, p in enumerate(procs):
        _, err = p.communicate(timeout=480)
        assert p.returncode == 0, (i, err[-1500:])
    assert outs[0].exists(), "process 0 must emit the listing"
    assert not outs[1].exists(), "process 1 must stay silent"
    assert outs[0].read_text() == single.read_text()
