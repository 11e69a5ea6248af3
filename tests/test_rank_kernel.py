"""Pallas rank kernel vs jnp reference (interpret mode on CPU backend)."""

import numpy as np
import jax.numpy as jnp

from slamem_tpu.index.build import build_index, rank_batch
from slamem_tpu.kernels.rank import rank_pallas
from slamem_tpu.utils.synth import random_genome, with_n_runs


def test_rank_pallas_matches_reference():
    rng = np.random.default_rng(140)
    t = with_n_runs(random_genome(5000, seed=141), 3, 40, seed=142)
    idx = build_index(t)  # occ_block 128
    b = 500
    chars = rng.integers(0, 4, size=b).astype(np.int32)
    pos = rng.integers(0, idx.n + 1, size=b).astype(np.int32)
    want = np.asarray(rank_batch(idx, jnp.asarray(chars), jnp.asarray(pos)))
    got = np.asarray(rank_pallas(idx, jnp.asarray(chars), jnp.asarray(pos),
                                 interpret=True))
    assert np.array_equal(got, want)


def test_rank_pallas_edges():
    t = random_genome(300, seed=143)
    idx = build_index(t)
    chars = jnp.asarray(np.array([0, 1, 2, 3, 0, 3], np.int32))
    pos = jnp.asarray(np.array([0, 1, idx.n, idx.n - 1, 128, 127], np.int32))
    want = np.asarray(rank_batch(idx, chars, pos))
    got = np.asarray(rank_pallas(idx, chars, pos, interpret=True))
    assert np.array_equal(got, want)


def test_scan_engine_through_pallas_rank():
    """Scan frontend driven by the Pallas occ kernel (interpret) == XLA."""
    from slamem_tpu.engine.scan_mode import scan_intervals

    ref = with_n_runs(random_genome(1500, seed=144), 2, 25, seed=145)
    qry = random_genome(700, seed=146)
    idx = build_index(ref)
    L = 12
    lo_x, w_x = scan_intervals(idx, qry, L, lane_block=64,
                               rank_kernel="xla")
    lo_p, w_p = scan_intervals(idx, qry, L, lane_block=64,
                               rank_kernel="pallas_interpret")
    assert np.array_equal(np.asarray(w_x), np.asarray(w_p))
    sel = np.asarray(w_x) > 0
    assert np.array_equal(np.asarray(lo_x)[sel], np.asarray(lo_p)[sel])


def test_rank_pallas_compiled_on_tpu():
    """Compiled-mode equivalence on the real chip (skips off-TPU)."""
    import jax
    import pytest

    if jax.devices()[0].platform == "cpu":
        pytest.skip("no TPU in this process")
    rng = np.random.default_rng(147)
    t = with_n_runs(random_genome(60_000, seed=148), 2, 30, seed=149)
    idx = build_index(t)
    b = 2048
    chars = rng.integers(0, 4, size=b).astype(np.int32)
    pos = rng.integers(0, idx.n + 1, size=b).astype(np.int32)
    want = np.asarray(rank_batch(idx, jnp.asarray(chars), jnp.asarray(pos)))
    got = np.asarray(rank_pallas(idx, jnp.asarray(chars), jnp.asarray(pos)))
    assert np.array_equal(got, want)


def test_rank_nibble_matches_reference():
    """Nibble-SWAR rank == rank_batch, both row widths, N/SEP content."""
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index, rank_batch
    from slamem_tpu.kernels.rank import rank_nib
    from slamem_tpu.utils.synth import random_genome, with_n_runs

    t = with_n_runs(random_genome(60_000, seed=71), 3, 25, seed=72)
    index = build_index(t)
    rng = np.random.default_rng(73)
    chars = jnp.asarray(rng.integers(0, 4, 4096).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, index.n + 1, 4096).astype(np.int32))
    want = np.asarray(rank_batch(index, chars, pos))
    for rw in (128, 512):
        got = np.asarray(rank_nib(index, chars, pos, row_words=rw))
        assert np.array_equal(want, got), rw
    # block-boundary and end positions
    edges = np.array([0, 1, 991, 992, 993, index.n - 1, index.n], np.int32)
    ec = jnp.asarray(np.arange(7, dtype=np.int32) % 4)
    ep = jnp.asarray(edges)
    assert np.array_equal(np.asarray(rank_batch(index, ec, ep)),
                          np.asarray(rank_nib(index, ec, ep)))
