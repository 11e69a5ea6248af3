"""Oracle self-consistency tests: the oracle must itself be trustworthy."""

import numpy as np

from slamem_tpu.io import str_to_codes
from slamem_tpu.oracle import count_occurrences, find_mems_codes, oracle_matches


def s(x):
    return str_to_codes(x)


def brute_mems(ref, qry, L):
    """Second, even dumber implementation: test every (r,q) start pair."""
    ref, qry = np.asarray(ref), np.asarray(qry)
    out = set()
    for r in range(len(ref)):
        for q in range(len(qry)):
            ln = 0
            while (r + ln < len(ref) and q + ln < len(qry)
                   and ref[r + ln] == qry[q + ln] and ref[r + ln] < 4):
                ln += 1
            if ln < L:
                continue
            left_ok = (r == 0 or q == 0 or ref[r - 1] != qry[q - 1]
                       or ref[r - 1] >= 4)
            if left_ok:
                out.add((r, q, ln))
    return sorted(out, key=lambda t: (t[1], t[0]))


def test_simple_exact():
    mems = find_mems_codes(s("ACGTACGT"), s("ACGTACGT"), 8)
    assert mems == [(0, 0, 8)]


def test_min_length_filters():
    assert find_mems_codes(s("ACGTAAAA"), s("TTTTACGT"), 5) == []
    assert find_mems_codes(s("ACGTC"), s("GGACGTCGG"), 4) == [(0, 2, 5)]


def test_n_never_matches():
    assert find_mems_codes(s("AANAA"), s("AANAA"), 5) == []
    mems = find_mems_codes(s("AANAA"), s("AANAA"), 2)
    assert sorted(mems) == [(0, 0, 2), (0, 3, 2), (3, 0, 2), (3, 3, 2)]


def test_against_brute_random():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n, m = int(rng.integers(5, 120)), int(rng.integers(5, 120))
        alpha = int(rng.integers(2, 5))  # small alphabets → many matches
        ref = rng.integers(0, alpha, size=n).astype(np.uint8)
        qry = rng.integers(0, alpha, size=m).astype(np.uint8)
        if trial % 3 == 0:  # sprinkle Ns
            ref[rng.integers(0, n, size=max(1, n // 10))] = 4
            qry[rng.integers(0, m, size=max(1, m // 10))] = 4
        L = int(rng.integers(2, 6))
        assert find_mems_codes(ref, qry, L) == brute_mems(ref, qry, L), (
            trial, ref, qry, L)


def test_count_occurrences():
    assert count_occurrences(s("AAAA"), s("AA")) == 3
    assert count_occurrences(s("ACGTACGT"), s("ACGT")) == 2
    assert count_occurrences(s("ACGT"), s("ACGTT")) == 0


def test_mam_mum_filters():
    # "ACGTT" occurs twice in ref; "CCCCC" once.
    ref = s("ACGTTACGTTCCCCCG")
    qry = s("ACGTTCCCCC")
    mems = oracle_matches(ref, qry, 5, "mem")
    assert (0, 0, 5) in mems and (5, 0, 10) in mems
    mams = oracle_matches(ref, qry, 5, "mam")
    # 10-mer "ACGTTCCCCC" occurs once in ref → kept; 5-mer "ACGTT" dup → cut
    assert all(ln != 5 or ref[r:r + 5].tobytes() != s("ACGTT").tobytes()
               for r, q, ln in mams)
    # query-unique check: plant a query repeat
    qry2 = s("CCCCCGCCCCCG")
    mums = oracle_matches(s("AAACCCCCGTTT"), qry2, 6, "mum")
    assert mums == []  # "CCCCCG" occurs twice in query → not a MUM
