"""query_to_device's 2-bit packed upload must be byte-exact vs the plain
uint8 upload for every input shape the engine streams (VERDICT r4 missing
#2: the packed wire is the one-shot serving fix — correctness gate is
bit-identical reconstituted codes)."""

import numpy as np
import pytest

from slamem_tpu.engine import seed_mode as sm
from slamem_tpu.io.fasta import CODE_N, CODE_SEP


def _fresh(arr):
    """Bypass the id-memoized cache: a copy is a distinct array object."""
    return arr.copy()


def _roundtrip(codes):
    qp, qt = sm.query_to_device(_fresh(codes))
    assert np.array_equal(np.asarray(qt), qp), (
        f"device codes differ from padded host codes (m={codes.size})")
    assert qp.shape[0] == sm.query_bucket(codes.size)


@pytest.mark.parametrize("m", [1, 5, 1023, 1024, 1025, 4096, 65536, 65537,
                               70001])
def test_packed_upload_exact_random(m):
    rng = np.random.default_rng(m)
    _roundtrip(rng.integers(0, 4, m).astype(np.uint8))


def test_packed_upload_with_specials():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    # scattered Ns, an N run, separators (joined multi-FASTA request shape),
    # and specials at both boundaries
    codes[rng.integers(0, codes.size, 200)] = CODE_N
    codes[10_000:10_500] = CODE_N
    codes[::7777] = CODE_SEP
    codes[0] = CODE_N
    codes[-1] = CODE_SEP
    _roundtrip(codes)


def test_special_dense_fallback_exact():
    # > 1/8 specials: the plain-upload fallback path must also be exact
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 20_000).astype(np.uint8)
    codes[: codes.size // 2] = CODE_N
    _roundtrip(codes)


def test_unaligned_view_input():
    # a view at an odd byte offset of a larger buffer (alignment guard)
    rng = np.random.default_rng(2)
    buf = rng.integers(0, 4, 4099).astype(np.uint8)
    codes = buf[3:]   # size 4096 == its query bucket, odd offset
    assert codes.size == sm.query_bucket(codes.size)
    _roundtrip(codes)


def test_pack_codes_2bit_layout():
    # byte j carries codes 4j..4j+3 at bits (0,2,4,6) — the documented wire
    codes = np.array([0, 1, 2, 3, 3, 2, 1, 0], np.uint8)
    packed = sm._pack_codes_2bit(codes)
    assert packed.tolist() == [0b11100100, 0b00011011]


def test_build_index_packed_text_upload_exact():
    """build_index's packed reference upload reconstitutes the exact text
    (specials included) — identical index arrays vs a plain-path build."""
    import jax.numpy as jnp

    from slamem_tpu.index.build import build_index

    rng = np.random.default_rng(9)
    text = rng.integers(0, 4, (1 << 20) + 7).astype(np.uint8)  # >= pack gate
    text[5000:5100] = CODE_N
    text[123456] = CODE_SEP
    idx_packed = build_index(text)
    idx_plain = build_index(jnp.asarray(text))  # jax input: plain path
    assert np.array_equal(np.asarray(idx_packed.text),
                          np.asarray(idx_plain.text))
    assert np.array_equal(np.asarray(idx_packed.sa),
                          np.asarray(idx_plain.sa))
    assert np.array_equal(np.asarray(idx_packed.bwt),
                          np.asarray(idx_plain.bwt))


def test_native_pack_matches_numpy_swar():
    """pack2.c and the numpy SWAR must be byte-identical on fuzzed inputs
    (every length class mod 8, specials included)."""
    import pytest

    from slamem_tpu.utils import pack2

    if pack2._pack_native is None:
        pytest.skip("native packer unavailable (no gcc)")

    def numpy_swar(qp):
        qp = np.ascontiguousarray(qp)
        if qp.__array_interface__["data"][0] % 4:
            qp = qp.copy()
        w = qp.view(np.uint32)
        w = w & np.uint32(0x03030303)
        w = (w | (w >> 6)) & np.uint32(0x000F000F)
        w = (w | (w >> 12)) & np.uint32(0xFF)
        return w.astype(np.uint8)

    rng = np.random.default_rng(3)
    for n in (4, 8, 12, 100, 1024, 4100, 65536, 1 << 20):
        codes = rng.integers(0, 6, n - n % 4).astype(np.uint8)
        assert np.array_equal(pack2._pack_native(codes), numpy_swar(codes))
