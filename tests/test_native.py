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
