"""Sparse seeding (stride-S sampling + endpoint extension) parity tests.

The sparse path (engine/seed_mode.py choose_stride) must be EXACT for MEM
mode: every test here checks it against the dense engine (sparse_seeds
"off") and, where cheap, the CPU oracle — across N runs, multi-FASTA,
text edges, low-complexity repeats, and the multi-round / run-overflow
fallbacks.
"""

import numpy as np
import pytest

from slamem_tpu.config import Config
from slamem_tpu.engine import seed_mode
from slamem_tpu.engine.seed_mode import (choose_stride, ext_arrays,
                                         find_seed_matches)
from slamem_tpu.index.build import build_index
from slamem_tpu.io import str_to_codes
from slamem_tpu.oracle import oracle_matches
from slamem_tpu.utils.synth import mutate, random_genome, with_n_runs


def tuples(index, q, cfg):
    m = find_seed_matches(index, q, cfg)
    return sorted(zip(m.refpos.tolist(), m.qpos.tolist(), m.length.tolist()))


def assert_sparse_equals_dense(ref, qry, L, oracle=False, **kw):
    ref = np.asarray(ref, np.uint8)
    qry = np.asarray(qry, np.uint8)
    index = build_index(ref, occ_block=32)
    sparse_cfg = Config(min_length=L, sparse_seeds="auto", **kw)
    k = seed_mode.choose_seed_k(index.n, len(qry), L,
                                sparse_cfg.seed_length_cap)
    assert choose_stride(k, L) > 1, "test must actually exercise sampling"
    got = tuples(index, qry, sparse_cfg)
    want = tuples(index, qry, Config(min_length=L, sparse_seeds="off", **kw))
    assert got == want, (f"sparse={got[:8]}... ({len(got)}) "
                         f"dense={want[:8]}... ({len(want)})")
    if oracle:
        ora = sorted((r, q, ln) for r, q, ln in
                     oracle_matches(ref, qry, L, "mem"))
        assert got == ora
    return got


@pytest.mark.parametrize("L", [17, 20, 25, 31, 32, 50])
def test_parity_mutated_pair(L):
    ref = random_genome(6000, seed=L)
    qry = mutate(ref, 0.02, 0.002, seed=L + 1)
    assert_sparse_equals_dense(ref, qry, L, oracle=(L <= 25))


def test_parity_with_n_runs():
    ref = with_n_runs(random_genome(5000, seed=9), 12, 30, seed=10)
    qry = with_n_runs(mutate(ref, 0.03, 0.003, seed=11), 12, 30, seed=12)
    assert_sparse_equals_dense(ref, qry, 18, oracle=True)


def test_parity_low_complexity():
    # tandem/low-complexity repeats: many overlapping runs per diagonal,
    # the adversarial case for the run<->MEM 1:1 argument
    rng = np.random.default_rng(21)
    parts = [random_genome(400, seed=22),
             str_to_codes("AC" * 300), str_to_codes("A" * 120),
             random_genome(300, seed=23), str_to_codes("ACGT" * 150),
             str_to_codes("AAG" * 100)]
    ref = np.concatenate(parts)
    qry = np.concatenate([parts[i] for i in rng.permutation(len(parts))])
    assert_sparse_equals_dense(ref, qry, 20, oracle=True,
                               pair_capacity=1 << 16)


def test_parity_match_at_edges():
    # maximal matches touching text starts/ends: extension must clamp
    ref = random_genome(2000, seed=31)
    qry = np.concatenate([ref[:300], random_genome(200, seed=32),
                          ref[-300:]])
    assert_sparse_equals_dense(ref, qry, 40, oracle=True)


def test_parity_exact_length_threshold():
    # a planted match of exactly L and one of L-1: the sparse filter must
    # agree with the dense one on both sides of the threshold
    rng = np.random.default_rng(41)
    ref = random_genome(3000, seed=41)
    for L in (24, 25, 26):
        qry = np.concatenate([random_genome(100, seed=42 + L),
                              ref[500:500 + 25],
                              random_genome(100, seed=52 + L)])
        assert_sparse_equals_dense(ref, qry, L, oracle=True)


def test_parity_multiround():
    # tiny capacity forces the sample-space multi-round path + the
    # post-merge extension dispatch; matches crossing round edges must
    # reassemble before extension
    ref = random_genome(4000, seed=61)
    qry = mutate(ref, 0.01, 0.001, seed=62)
    assert_sparse_equals_dense(ref, qry, 20, oracle=True,
                               pair_capacity=64, position_block=37)


def test_parity_run_overflow():
    # >4096 runs in one round with pairs under capacity: forces the
    # run-capacity overflow branch (raw pair fetch + sample-space host
    # decode). k=8 noise collisions make singleton runs en masse.
    ref = random_genome(30000, seed=71)
    qry = np.concatenate([random_genome(50000, seed=72),
                          ref[1000:1400], random_genome(10000, seed=73)])
    assert_sparse_equals_dense(ref, qry, 17, seed_length_cap=8,
                               pair_capacity=1 << 13)


def test_parity_multifasta_and_revcomp_codes():
    # separator-joined multi-FASTA texts on both sides: matches never
    # cross separators, extensions must stop at them
    refs = [random_genome(1200, seed=81), random_genome(900, seed=82)]
    sep = np.asarray([5], np.uint8)
    ref = np.concatenate([refs[0], sep, refs[1]])
    qry = np.concatenate([mutate(refs[1], 0.02, 0.002, seed=83), sep,
                          refs[0][200:600]])
    assert_sparse_equals_dense(ref, qry, 22, oracle=True)


def test_parity_on_mesh():
    # replicated-index data-parallel mesh path with sparse seeding: device
    # blocks partition SAMPLE space, fragments all_gather as sample-space
    # triples and extend post-merge
    from slamem_tpu.dist.mesh import make_mesh, put_replicated

    ref = random_genome(4000, seed=91)
    qry = mutate(ref, 0.015, 0.0015, seed=92)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    cfg = Config(min_length=20, pair_capacity=256, position_block=29)
    k = seed_mode.choose_seed_k(index.n, len(qry), 20, cfg.seed_length_cap)
    assert choose_stride(k, 20) > 1
    want = tuples(index, qry, cfg)
    mesh = make_mesh(8)
    index_r = put_replicated(index, mesh)
    m = find_seed_matches(index_r, qry, cfg, mesh=mesh)
    got_mesh = sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                          m.length.tolist()))
    assert got_mesh == want


def test_parity_sharded():
    # SA-rank-sharded index path: a run's samples scatter over slabs by SA
    # rank (arbitrary partition), merge_runs + post-merge extension must
    # still be exact; both frontends
    from slamem_tpu.dist.mesh import make_mesh
    from slamem_tpu.dist.sharded import find_seed_matches_sharded

    ref = random_genome(5000, seed=101)
    qry = mutate(ref, 0.01, 0.001, seed=102)
    index = build_index(np.asarray(ref, np.uint8), occ_block=32)
    mesh = make_mesh(8)
    want = tuples(index, qry, Config(min_length=25, sparse_seeds="off"))
    for fe in ("join", "bucket"):
        cfg = Config(min_length=25, pair_capacity=512, frontend=fe)
        m = find_seed_matches_sharded(index, qry, cfg, mesh)
        got = sorted(zip(m.refpos.tolist(), m.qpos.tolist(),
                         m.length.tolist()))
        assert got == want, fe


def test_choose_stride_values():
    assert choose_stride(16, 16) == 1
    assert choose_stride(16, 17) == 2
    assert choose_stride(16, 20) == 5
    assert choose_stride(16, 31) == 16
    assert choose_stride(16, 50) == 16
    assert choose_stride(32, 50) == 16
    assert choose_stride(8, 17) == 8


def test_ext_arrays_semantics():
    t = str_to_codes("ACGTNACGTACGTACGTACGTA")
    fx, fxl, lvl, lvr = (np.asarray(a) for a in ext_arrays(
        np.asarray(t, np.uint8)))
    n = len(t)
    assert fx.shape == (n + 1,) and lvl.shape == (n + 1,)
    # lvr[i] counts ordinary chars from i, capped 16, 0 at the end
    assert lvr[0] == 4 and lvr[4] == 0 and lvr[5] == 16 and lvr[n] == 0
    # lvl[i] counts ordinary chars left of i; 0 at start and after N
    assert lvl[0] == 0 and lvl[4] == 4 and lvl[5] == 0 and lvl[6] == 1
    assert lvl[n] == min(16, n - 5)
    # fx packs [i, i+16) most-significant-first
    window = 0
    for c in t[5:21]:
        window = window * 4 + int(c & 3)
    assert fx[5] == window
    # fxl[i] packs [i-16, i): fxl[21] covers the same window
    assert fxl[21] == window


def test_span_prefilter_deep_minlen_oracle_exact():
    """The w_min >= 2 fused branch (pre-extension span filter + extension
    on the compacted kept buffer) is oracle-exact: L=40 with K capped at
    12 gives stride 12 and w_min = 2, the chr-scale shape."""
    from slamem_tpu.engine import seed_mode as sm
    from slamem_tpu.oracle import oracle_matches

    ref = random_genome(40_000, seed=801)
    qry = mutate(ref, 0.01, 0.001, seed=802)
    cfg = Config(min_length=40, seed_length_cap=12)
    k, stride, _ = sm.choose_seed_plan(40_001, len(qry), cfg)
    span_need = cfg.min_length - k - 2 * (stride - 1)
    assert span_need > 0 and -(-span_need // stride) + 1 >= 2, \
        (k, stride)  # the test must actually hit the pre-filter branch
    index = build_index(np.asarray(ref, np.uint8))
    want = sorted((int(a), int(b), int(c)) for a, b, c in
                  oracle_matches(np.asarray(index.text[:-1]), qry,
                                 cfg.min_length, "mem"))
    for i in range(3):  # default caps, snapped caps, converged
        m = sm.find_seed_matches(index, np.asarray(qry, np.uint8), cfg)
        got = sorted(zip(np.asarray(m.refpos).tolist(),
                         np.asarray(m.qpos).tolist(),
                         np.asarray(m.length).tolist()))
        assert got == want, i


def test_elig_buffer_overflow_falls_back_exact():
    """A stale tiny 'elig' prediction under-sizes the span-eligible
    intermediate; the n_elig > elig_cap overflow must discard the fused
    wire and fall through to the exact multi-round path."""
    import weakref

    from slamem_tpu.engine import seed_mode as sm

    ref = random_genome(600_000, seed=811)
    qry = mutate(ref, 0.01, 0.001, seed=812)
    cfg = Config(min_length=40, seed_length_cap=12)
    index = build_index(np.asarray(ref, np.uint8))
    qarr = np.asarray(qry, np.uint8)
    want = sorted(
        zip(*map(lambda a: np.asarray(a).tolist(),
                 (lambda m: (m.refpos, m.qpos, m.length))(
                     sm.find_seed_matches(index, qarr, cfg)))))
    m_p = int(sm.pad_query(qarr).shape[0])
    k, stride, _ = sm.choose_seed_plan(index.n, m_p, cfg)
    assert sm.span_w_min(cfg.min_length, k, stride) >= 2
    pairs, runs, kept = sm._last_total(index, k, stride)
    nz = sm._last_nonzero(index, k, stride)
    n_elig = sm._last_elig(index, k, stride)
    assert n_elig is not None and n_elig > 4096 + 64, n_elig
    # poison ONLY the elig prediction (floor bucket is 4096)
    sm._set_last_total(index, k, pairs, runs, stride, kept=kept,
                       nonzero=nz, elig=10)
    plan = sm.plan_fused(index, m_p, cfg)
    assert plan.elig_cap < n_elig   # under-sized: the fused wire overflows
    m = sm.find_seed_matches(index, qarr, cfg)
    got = sorted(zip(np.asarray(m.refpos).tolist(),
                     np.asarray(m.qpos).tolist(),
                     np.asarray(m.length).tolist()))
    assert got == want
