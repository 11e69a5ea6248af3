"""Index structure unit tests (SURVEY.md §4 item 2)."""

import numpy as np
import jax.numpy as jnp

from slamem_tpu.io import str_to_codes, parse_fasta_bytes
from slamem_tpu.index.build import (
    backward_step, build_index, rank_batch, BWT_SENTINEL)


def naive_sa(text: np.ndarray) -> np.ndarray:
    """Reference suffix order: specials unique-by-position, below ACGT."""
    n = len(text)
    vals = [int(p) if text[p] >= 4 else n + int(text[p]) for p in range(n)]
    return np.array(sorted(range(n), key=lambda i: vals[i:]), dtype=np.int32)


def naive_count_matches(text: np.ndarray, pat: np.ndarray) -> int:
    n, k = len(text), len(pat)
    if k == 0 or n < k:
        return 0
    win = np.lib.stride_tricks.sliding_window_view(text, k)
    return int(np.all(win == pat, axis=1).sum())


def rand_text(rng, n, with_specials=True):
    t = rng.integers(0, 4, size=n).astype(np.uint8)
    if with_specials and n > 4:
        t[rng.integers(0, n, size=max(1, n // 12))] = 4
        t[rng.integers(0, n, size=max(1, n // 20))] = 5
    return t


def terminated(t):
    return np.append(t, np.uint8(5))  # build_index appends a SEP terminator


def test_sa_matches_naive():
    rng = np.random.default_rng(0)
    for trial in range(12):
        n = int(rng.integers(2, 200))
        t = rand_text(rng, n, with_specials=trial % 2 == 0)
        idx = build_index(t, occ_block=16)
        assert np.array_equal(np.asarray(idx.sa), naive_sa(terminated(t))), (
            trial, t)


def test_bwt_definition():
    t = terminated(str_to_codes("GATTACA"))
    idx = build_index(str_to_codes("GATTACA"), occ_block=4)
    sa = np.asarray(idx.sa)
    bwt = np.asarray(idx.bwt)
    for j in range(len(t)):
        if sa[j] == 0:
            assert bwt[j] == BWT_SENTINEL
        else:
            assert bwt[j] == t[sa[j] - 1]


def test_occ_vs_cumsum():
    rng = np.random.default_rng(1)
    t = rand_text(rng, 300)
    idx = build_index(t, occ_block=32)
    bwt = np.asarray(idx.bwt)
    qpos = rng.integers(0, idx.n + 1, size=64).astype(np.int32)
    qchar = rng.integers(0, 4, size=64).astype(np.int32)
    got = np.asarray(rank_batch(idx, jnp.asarray(qchar), jnp.asarray(qpos)))
    want = np.array([(bwt[:p] == c).sum() for c, p in zip(qchar, qpos)])
    assert np.array_equal(got, want)


def test_backward_search_counts():
    """Full backward search of random patterns == naive substring count."""
    rng = np.random.default_rng(2)
    t = rand_text(rng, 500)
    idx = build_index(t, occ_block=32)
    n = len(t)
    for _ in range(30):
        plen = int(rng.integers(1, 12))
        if rng.random() < 0.6 and n > plen:  # planted (guaranteed-hit) pattern
            s = int(rng.integers(0, n - plen))
            pat = t[s:s + plen]
            if (pat >= 4).any():
                continue
        else:
            pat = rng.integers(0, 4, size=plen).astype(np.uint8)
        lo = jnp.zeros((1,), jnp.int32)
        hi = jnp.full((1,), idx.n, jnp.int32)
        for c in pat[::-1]:  # backward search processes pattern right-to-left
            lo, hi = backward_step(idx, jnp.array([c], jnp.int32), lo, hi)
        assert int(hi[0] - lo[0]) == naive_count_matches(t, pat), pat


def test_sa_interval_is_match_positions():
    """The SA slice of the backward-search interval = all match positions."""
    t = str_to_codes("ACGTACGTTACGA")
    idx = build_index(t, occ_block=8)
    pat = str_to_codes("ACG")
    lo = jnp.zeros((1,), jnp.int32)
    hi = jnp.full((1,), idx.n, jnp.int32)
    for c in pat[::-1]:
        lo, hi = backward_step(idx, jnp.array([c], jnp.int32), lo, hi)
    got = sorted(int(p) for p in np.asarray(idx.sa)[int(lo[0]):int(hi[0])])
    assert got == [0, 4, 9]


def test_multifasta_boundary_not_crossed():
    """'ACGT' must not be found when split across two sequences."""
    fs = parse_fasta_bytes(b">a\nTTAC\n>b\nGTTT\n")
    text, _ = fs.with_separators()
    idx = build_index(text, occ_block=8)
    pat = str_to_codes("ACGT")
    lo = jnp.zeros((1,), jnp.int32)
    hi = jnp.full((1,), idx.n, jnp.int32)
    for c in pat[::-1]:
        lo, hi = backward_step(idx, jnp.array([c], jnp.int32), lo, hi)
    assert int(hi[0] - lo[0]) == 0
