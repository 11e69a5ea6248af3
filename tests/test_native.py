"""Native parser vs numpy parser: contract identity (fuzzed)."""

import numpy as np
import pytest

from slamem_tpu.io.fasta import parse_fasta_bytes

native = pytest.importorskip("slamem_tpu._native.fastaio")


CASES = [
    b">seq1 desc here\nACGT\nNNAC\n>seq2\ngggt\n",
    b">a\r\nAC GT\r\n\r\n>b\nTT\tAA\n",
    b">x\nARYSWKMBDHVNacgt\n",
    b">only-header\n",
    b">n1\nACGT",                      # no trailing newline
    b"> spaced-name  rest\nAC\n",
    b">a\nACGT\n>b\n>c\nTT\n",          # empty middle record
]


@pytest.mark.parametrize("buf", CASES)
def test_native_matches_numpy(buf):
    a = parse_fasta_bytes(buf)
    b = native.parse(buf)
    assert a.names == b.names
    assert np.array_equal(a.starts, b.starts)
    assert np.array_equal(a.lengths, b.lengths)
    assert np.array_equal(a.codes, b.codes)


@pytest.mark.parametrize("buf", [b"", b"ACGT\n", b"no header at all"])
def test_native_rejects_bad(buf):
    with pytest.raises(ValueError):
        native.parse(buf)


def test_native_fuzz():
    rng = np.random.default_rng(90)
    alphabet = b"ACGTNacgtn \t\r\n>xyz|123"
    for _ in range(60):
        n = int(rng.integers(1, 400))
        buf = bytes(bytearray(alphabet[i] for i in
                              rng.integers(0, len(alphabet), size=n)))
        buf = b">f\n" + buf  # ensure header
        a = parse_fasta_bytes(buf)
        b = native.parse(buf)
        assert a.names == b.names
        assert np.array_equal(a.codes, b.codes)
        assert np.array_equal(a.lengths, b.lengths)


def test_native_revcomp():
    import ctypes

    from slamem_tpu.io.fasta import revcomp_codes, str_to_codes

    arr = str_to_codes("ACGTNAC").copy()
    want = revcomp_codes(arr)
    native._lib.revcomp_codes(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), len(arr))
    assert np.array_equal(arr, want)


def test_matchfmt_native_equals_python():
    """Native and Python renderers must be byte-identical (fuzzed)."""
    import numpy as np

    from slamem_tpu.engine.run import EngineOutput, QueryMatches
    from slamem_tpu.report.format import format_matches

    rng = np.random.default_rng(500)
    for trial in range(12):
        n_ref = int(rng.integers(1, 4))
        ref_names = [f"ref{'X' * int(rng.integers(0, 9))}{i}"
                     for i in range(n_ref)]
        per_query = []
        for qi in range(int(rng.integers(1, 4))):
            n = int(rng.integers(0, 50))
            hi = int(rng.integers(10, 10**int(rng.integers(2, 10))) + 2)
            per_query.append(QueryMatches(
                query_name=f"q{qi}", reverse=bool(rng.integers(0, 2)),
                ref_seq=rng.integers(0, n_ref, n).astype(np.int64),
                ref_pos=rng.integers(0, hi, n).astype(np.int64),
                q_pos=rng.integers(0, hi, n).astype(np.int64),
                length=rng.integers(1, hi, n).astype(np.int64)))
        out = EngineOutput(ref_names=ref_names, per_query=per_query,
                           stats={})
        a = format_matches(out, force="python")
        b = format_matches(out, force="native")
        assert a == b, f"trial {trial}: first diff at " \
            f"{next(i for i,(x,y) in enumerate(zip(a,b)) if x!=y)}"
