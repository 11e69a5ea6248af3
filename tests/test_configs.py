"""Integration tests shaped like the five BASELINE acceptance configs
(synthetic stand-ins, SURVEY.md §6), engine output vs oracle per query."""

import numpy as np

from slamem_tpu.config import Config, MatchMode
from slamem_tpu.dist.mesh import make_mesh
from slamem_tpu.engine.run import run_engine
from slamem_tpu.io import FastaSet, parse_fasta_bytes
from slamem_tpu.oracle import oracle_matches
from slamem_tpu.report.format import format_matches
from slamem_tpu.utils.synth import mutate, random_genome


def make_set(arrs, names):
    lengths = np.array([len(a) for a in arrs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1])).astype(np.int64)
    return FastaSet(names=names, starts=starts, lengths=lengths,
                    codes=np.concatenate(arrs))


def check_vs_oracle(out, ref_set, query_set, cfg):
    rtext, rstarts = ref_set.with_separators()
    i = 0
    from slamem_tpu.io.fasta import revcomp_codes

    for qi in range(query_set.num_seqs):
        for rev in ([False, True] if cfg.both_strands else [False]):
            qm = out.per_query[i]
            i += 1
            q = query_set.sequence(qi).codes
            if rev:
                q = revcomp_codes(q)
            want = oracle_matches(rtext, q, cfg.min_length, cfg.mode.value)
            got = []
            for j in range(qm.length.size):
                gpos = int(rstarts[qm.ref_seq[j]] + qm.ref_pos[j])
                got.append((gpos, int(qm.q_pos[j]), int(qm.length[j])))
            assert sorted(got) == sorted(want), (qi, rev)


def test_config2_multistrain_query():
    """10 diverged strains as one multi-FASTA query vs one reference."""
    base = random_genome(1200, seed=100)
    strains = [mutate(base, 0.02, 0.002, seed=101 + i) for i in range(10)]
    ref_set = make_set([base], ["refgenome"])
    q_set = make_set(strains, [f"strain{i}" for i in range(10)])
    cfg = Config(min_length=15)
    out = run_engine(ref_set, q_set, cfg)
    assert len(out.per_query) == 10
    check_vs_oracle(out, ref_set, q_set, cfg)
    text = format_matches(out)
    for i in range(10):
        assert f"> strain{i}\n" in text


def test_config3_mam_mode():
    ref = random_genome(1500, seed=110)
    ref[800:900] = ref[100:200]
    qry = mutate(ref, 0.015, 0.001, seed=111)
    ref_set = make_set([ref], ["K12"])
    q_set = make_set([qry], ["O157"])
    cfg = Config(min_length=14, mode=MatchMode.MAM)
    out = run_engine(ref_set, q_set, cfg)
    check_vs_oracle(out, ref_set, q_set, cfg)


def test_config1_both_strands_multifasta_ref():
    fs = parse_fasta_bytes(
        b">chrA\n" + b"ACGGTTAACCGGATCGATCG" * 40 + b"\n>chrB\n"
        + b"TTGACCAGGATCCTTAGGCA" * 40 + b"\n")
    qry = mutate(fs.codes[:600].copy(), 0.02, 0.002, seed=120)
    q_set = make_set([qry], ["q1"])
    cfg = Config(min_length=12, both_strands=True)
    out = run_engine(fs, q_set, cfg)
    assert len(out.per_query) == 2
    check_vs_oracle(out, fs, q_set, cfg)


def test_config5_sharded_equals_replicated_pipeline():
    ref = random_genome(3000, seed=130)
    qry = mutate(ref, 0.02, 0.001, seed=131)
    ref_set = make_set([ref], ["chr1"])
    q_set = make_set([qry], ["mouse_chr1"])
    mesh = make_mesh(8)
    out_r = run_engine(ref_set, q_set, Config(min_length=16))
    out_s = run_engine(ref_set, q_set, Config(min_length=16,
                                              shard_index=True), mesh=mesh)
    assert format_matches(out_r) == format_matches(out_s)


def test_joined_request_cache_repeats_and_strand_change():
    """run_engine memoizes the joined multi-entry request text on the
    query set (config #2 repeats skip the re-upload); repeats return
    identical output and a strand-flag change invalidates the cache."""
    ref = random_genome(30_000, seed=901)
    strains = [mutate(ref, 0.01, 0.001, seed=910 + j) for j in range(3)]
    ref_set = make_set([ref], ["ref"])
    qry_set = make_set(strains, [f"s{j}" for j in range(3)])

    def tuples(out):
        return [(qm.query_name, qm.reverse,
                 qm.ref_pos.tolist(), qm.q_pos.tolist(),
                 qm.length.tolist()) for qm in out.per_query]

    cfg = Config(min_length=20)
    out1 = run_engine(ref_set, qry_set, cfg)
    assert getattr(qry_set, "_joined_cache", None) is not None
    cached_text = qry_set._joined_cache[1]
    out2 = run_engine(ref_set, qry_set, cfg)
    assert qry_set._joined_cache[1] is cached_text   # reused, not rebuilt
    assert tuples(out1) == tuples(out2)
    check_vs_oracle(out2, ref_set, qry_set, cfg)

    cfg_b = Config(min_length=20, both_strands=True)
    out3 = run_engine(ref_set, qry_set, cfg_b)
    # rebuilt for -b; key also carries codes identity (ADVICE r4 contract)
    assert qry_set._joined_cache[0] == ((False, True), id(qry_set.codes))
    check_vs_oracle(out3, ref_set, qry_set, cfg_b)

    # replacing the codes array (the one legal "mutation") invalidates the
    # memo even with identical strands
    import dataclasses as _dc

    import numpy as _np

    qry_set2 = _dc.replace(qry_set, codes=qry_set.codes.copy())
    qry_set2._joined_cache = qry_set._joined_cache  # simulate a stale carry
    out4 = run_engine(ref_set, qry_set2, cfg_b)
    assert qry_set2._joined_cache[0][1] == id(qry_set2.codes)
    assert tuples(out3) == tuples(out4)
    assert _np.array_equal(qry_set2.codes, qry_set.codes)
