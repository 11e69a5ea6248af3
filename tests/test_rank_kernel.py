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
