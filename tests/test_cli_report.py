"""CLI, formatter, index save/load and dot-plot tests (golden-file gated)."""

import os

import numpy as np
import pytest

from slamem_tpu.cli.main import CliError, main, parse_args
from slamem_tpu.config import MatchMode
from slamem_tpu.io import Sequence, write_fasta
from slamem_tpu.utils.synth import mutate, random_genome


def test_parse_args_full():
    cfg, ref, queries, extras = parse_args(
        ["-mum", "-l", "30", "-o", "out.txt", "-b", "ref.fa", "q1.fa", "q2.fa"])
    assert cfg.mode is MatchMode.MUM
    assert cfg.min_length == 30
    assert cfg.out_path == "out.txt"
    assert cfg.both_strands
    assert ref == "ref.fa"
    assert queries == ["q1.fa", "q2.fa"]


def test_parse_args_defaults():
    cfg, ref, queries, _ = parse_args(["r.fa", "q.fa"])
    assert cfg.mode is MatchMode.MEM and cfg.min_length == 20
    assert not cfg.both_strands


@pytest.mark.parametrize("argv", [
    [], ["r.fa"], ["-l"], ["-l", "x", "r.fa", "q.fa"], ["-badflag", "r", "q"],
    ["-engine", "bogus", "r", "q"], ["-l", "0", "r.fa", "q.fa"],
])
def test_parse_args_errors(argv):
    with pytest.raises(CliError):
        parse_args(argv)


@pytest.fixture
def small_pair(tmp_path):
    ref = random_genome(800, seed=31)
    qry = mutate(ref, 0.02, 0.002, seed=32)
    rp, qp = tmp_path / "ref.fa", tmp_path / "qry.fa"
    write_fasta(rp, [Sequence("refseq", ref)])
    write_fasta(qp, [Sequence("queryseq", qry)])
    return rp, qp


def test_cli_end_to_end(small_pair, tmp_path, capsys):
    rp, qp = small_pair
    outp = tmp_path / "m.txt"
    rc = main(["-l", "15", "-o", str(outp), str(rp), str(qp)])
    assert rc == 0
    text = outp.read_text()
    assert text.startswith("> queryseq\n")
    lines = [l for l in text.splitlines()[1:] if l.strip()]
    assert len(lines) >= 1
    cols = lines[0].split()
    assert len(cols) == 3 and all(c.isdigit() for c in cols)
    # 1-based sanity: positions >= 1
    assert all(int(c) >= 1 for c in cols)


def test_cli_reverse_headers(small_pair, tmp_path):
    rp, qp = small_pair
    outp = tmp_path / "m.txt"
    assert main(["-b", "-l", "15", "-o", str(outp), str(rp), str(qp)]) == 0
    text = outp.read_text()
    assert "> queryseq\n" in text
    assert "> queryseq Reverse\n" in text


def test_cli_save_load_roundtrip(small_pair, tmp_path):
    rp, qp = small_pair
    idxp = tmp_path / "ref.npz"
    out1 = tmp_path / "m1.txt"
    out2 = tmp_path / "m2.txt"
    assert main(["-save", str(idxp), "-l", "15", "-o", str(out1),
                 str(rp), str(qp)]) == 0
    assert idxp.exists()
    assert main(["-load", str(idxp), "-l", "15", "-o", str(out2),
                 str(rp), str(qp)]) == 0
    assert out1.read_text() == out2.read_text()


def test_cli_load_mismatched_index(small_pair, tmp_path):
    rp, qp = small_pair
    other = random_genome(300, seed=99)
    op = tmp_path / "other.fa"
    write_fasta(op, [Sequence("other", other)])
    idxp = tmp_path / "other.npz"
    assert main(["-save", str(idxp), str(op)]) == 0
    assert main(["-load", str(idxp), "-o", str(tmp_path / "x.txt"),
                 str(rp), str(qp)]) == 2


def test_cli_dotplot(small_pair, tmp_path):
    rp, qp = small_pair
    plotp = tmp_path / "plot.bmp"
    assert main(["-l", "15", "-o", str(tmp_path / "m.txt"), "-plot",
                 str(plotp), str(rp), str(qp)]) == 0
    blob = plotp.read_bytes()
    assert blob[:2] == b"BM"
    assert len(blob) == 14 + 40 + 1024 * 1024 * 3  # 1024x1024x24bpp


def test_golden_listing(tmp_path):
    """Frozen-format golden: any formatter change must be deliberate."""
    ref = random_genome(400, seed=41)
    # spacer bases chosen to mismatch the bordering ref bases so the two
    # planted matches have exactly the expected lengths
    spacer = np.array([(ref[130] + 1) % 4, 2, (ref[199] + 1) % 4], np.uint8)
    qry = np.concatenate([ref[50:130], spacer, ref[200:260]])
    rp, qp = tmp_path / "r.fa", tmp_path / "q.fa"
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, [Sequence("Q", qry)])
    outp = tmp_path / "o.txt"
    assert main(["-l", "20", "-o", str(outp), str(rp), str(qp)]) == 0
    golden = (
        "> Q\n"
        "      51         1        80\n"
        "     201        84        60\n"
    )
    assert outp.read_text() == golden


def test_cli_scan_engine_matches_seed(small_pair, tmp_path):
    rp, qp = small_pair
    o1, o2 = tmp_path / "seed.txt", tmp_path / "scan.txt"
    assert main(["-l", "15", "-engine", "seed", "-o", str(o1), str(rp), str(qp)]) == 0
    assert main(["-l", "15", "-engine", "scan", "-o", str(o2), str(rp), str(qp)]) == 0
    assert o1.read_text() == o2.read_text()
    assert len(o1.read_text().splitlines()) > 1


def test_cli_shard_flag(tmp_path):
    """-shard runs the sharded-index path over the fake device mesh and
    produces bytes identical to the replicated run."""
    import subprocess
    import sys

    from slamem_tpu.io import Sequence, write_fasta
    from slamem_tpu.utils.synth import mutate, random_genome

    ref = random_genome(3000, seed=401)
    qry = mutate(ref, 0.02, 0.002, seed=402)
    rp, qp = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, [Sequence("Q", qry)])
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    outs = []
    for flags in ([], ["-shard"]):
        r = subprocess.run(
            [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
             "-o", "-", *flags, rp, qp],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        outs.append(r.stdout)
    assert outs[0] == outs[1] and outs[0].count("\n") > 3


def test_multihost_init_gating(monkeypatch):
    """Env unset -> no jax.distributed.initialize call, returns False;
    coordinator env set -> joins and reports multi-process membership."""
    import jax

    from slamem_tpu.dist import mesh as dm

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    assert dm.initialize_multihost() is False
    assert calls == []

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert dm.initialize_multihost() is True
    assert calls == [1]


def test_is_output_process_single_host():
    from slamem_tpu.dist.mesh import is_output_process

    assert is_output_process() is True


def test_cli_nonzero_process_emits_nothing(small_pair, tmp_path, monkeypatch):
    """On an SPMD pod launch only process 0 writes the listing; other
    processes compute and exit 0 without touching the filesystem."""
    from slamem_tpu.dist import mesh as dm

    rp, qp = map(str, small_pair)
    out = tmp_path / "out.txt"
    monkeypatch.setattr(dm, "is_output_process", lambda: False)
    assert main(["-l", "15", "-o", str(out), rp, qp]) == 0
    assert not out.exists()
    monkeypatch.setattr(dm, "is_output_process", lambda: True)
    assert main(["-l", "15", "-o", str(out), rp, qp]) == 0
    assert out.exists() and len(out.read_text().splitlines()) > 1


def test_multifasta_mum_mam_joined_dispatch(tmp_path):
    """MUM/MAM multi-FASTA queries ride the joined single-dispatch path;
    per-sequence uniqueness must match a per-sequence oracle run."""
    from slamem_tpu.oracle.naive import oracle_matches

    ref = random_genome(4000, seed=801)
    ref[2500:2650] = ref[500:650]  # duplication so MAM/MUM bite
    seqs = [Sequence(f"s{j}", mutate(ref, 0.01 + 0.002 * j, 0.001,
                                     seed=810 + j)) for j in range(3)]
    # plant a query-side duplication inside s1 (MUM killer)
    seqs[1].codes[1000:1100] = seqs[1].codes[200:300]
    rp, qp = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, seqs)
    for mode in ("mam", "mum"):
        out = tmp_path / f"o_{mode}.txt"
        assert main([f"-{mode}", "-l", "14", "-o", str(out), rp, qp]) == 0
        got: dict[str, set] = {s.name: set() for s in seqs}
        cur = None
        for line in out.read_text().splitlines():
            if line.startswith(">"):
                cur = line[1:].strip().split()[0]
            else:
                p = line.split()
                got[cur].add((int(p[0]) - 1, int(p[1]) - 1, int(p[2])))
        for s in seqs:
            want = set((int(a), int(b), int(c)) for a, b, c in
                       oracle_matches(ref, s.codes, 14, mode))
            assert got[s.name] == want, (mode, s.name)


def test_cli_slabs_flag(tmp_path):
    """-shard -slabs N (virtual multi-slab program, N decoupled from the
    device count) and -b joined requests through it produce bytes
    identical to the replicated run."""
    import subprocess
    import sys

    from slamem_tpu.io import Sequence, write_fasta
    from slamem_tpu.utils.synth import mutate, random_genome

    ref = random_genome(3000, seed=411)
    qry = mutate(ref, 0.02, 0.002, seed=412)
    rp, qp = str(tmp_path / "r.fa"), str(tmp_path / "q.fa")
    write_fasta(rp, [Sequence("R", ref)])
    write_fasta(qp, [Sequence("Q", qry), Sequence("Q2", qry[:1000])])
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    for extra in ([], ["-b"]):
        outs = []
        for flags in ([], ["-shard", "-slabs", "3"]):
            r = subprocess.run(
                [sys.executable, "-m", "slamem_tpu.cli.main", "-l", "14",
                 "-o", "-", *extra, *flags, rp, qp],
                capture_output=True, text=True, env=env)
            assert r.returncode == 0, r.stderr[-1500:]
            outs.append(r.stdout)
        assert outs[0] == outs[1] and outs[0].count("\n") > 3
