"""2-bit code-plane packing for host->device uploads.

DNA codes are 0..5 (io/fasta.py): ACGT in 2 bits plus rare specials
(N=4, SEP=5). Shipping uint8 codes costs 1 byte/bp — on tunneled backends
(~78 MB/s measured) that wire dominates one-shot serving and adds seconds
to a chr-scale index build. The pack here ships a 2-bit plane (4 bp/byte)
plus a sparse (index, value) side channel for the specials, and a single
device program reconstitutes exact uint8 codes. Used by the query upload
(engine/seed_mode.query_to_device) and the reference-text upload
(index/build.build_index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from slamem_tpu.io.fasta import CODE_N


try:                                     # native fast path (~10x numpy)
    from slamem_tpu._native.pack2n import pack_codes_2bit as _pack_native
except ImportError:                      # no gcc: numpy SWAR carries on
    _pack_native = None


def pack_codes_2bit(qp: np.ndarray) -> np.ndarray:
    """Host-side 2-bit pack: 4 codes/byte, low code first (bits 0,2,4,6).

    Input length must be a multiple of 4. Only the low 2 bits of each code
    survive (specials N=4 -> 0, SEP=5 -> 1 alias onto A/C); callers restore
    specials from a side channel. Dispatches to the native SWAR packer
    (_native/pack2.c) when the toolchain built it; the numpy fallback does
    the same SWAR over a uint32 view in ~5 vector passes. Both produce
    identical bytes (fuzz-tested).
    """
    if _pack_native is not None:
        return _pack_native(qp)
    qp = np.ascontiguousarray(qp)
    if qp.__array_interface__["data"][0] % 4:
        qp = qp.copy()            # 4-byte-align for the uint32 view
    w = qp.view(np.uint32)
    w = w & np.uint32(0x03030303)           # c0@0, c1@8, c2@16, c3@24
    w = (w | (w >> 6)) & np.uint32(0x000F000F)   # c0|c1<<2 @0, c2|c3<<2 @16
    w = (w | (w >> 12)) & np.uint32(0xFF)        # all four in bits 0..7
    return w.astype(np.uint8)


def spec_bucket(n: int) -> int:
    """Pad special-position side channels to power-of-2 capacities so the
    unpack program compiles once per bucket, not per special count."""
    p = 16
    while p < n:
        p <<= 1
    return p


@jax.jit
def unpack_codes(pb: jax.Array, spec_idx: jax.Array,
                 spec_val: jax.Array, m_real: jax.Array) -> jax.Array:
    """Device-side inverse of pack_codes_2bit (+ specials + tail pad).

    The 2-bit plane unpacks with broadcast shifts; positions >= m_real
    become CODE_N arithmetically instead of riding the wire; real specials
    (N runs, separators) scatter from the (idx, val) side channel — pad
    entries carry an out-of-range index and drop (mode="drop").
    """
    shifts = jnp.arange(4, dtype=jnp.uint32) * 2
    codes = ((pb[:, None].astype(jnp.uint32) >> shifts[None, :]) & 3
             ).astype(jnp.uint8).reshape(-1)
    tail = jnp.arange(codes.shape[0], dtype=jnp.int32) >= m_real
    codes = jnp.where(tail, jnp.uint8(CODE_N), codes)
    return codes.at[spec_idx].set(spec_val, mode="drop")


def codes_to_device(codes_padded: np.ndarray, m_real: int
                    ) -> jax.Array | None:
    """Upload exact uint8 codes via the packed wire; None = caller should
    fall back to the plain upload (special-dense input, > 1/8 positions —
    the side channel would rival the plane it rides with)."""
    spec = np.flatnonzero(codes_padded[:m_real] >= CODE_N).astype(np.int32)
    if spec.size > max(16, m_real // 8):
        return None
    cap = spec_bucket(spec.size)
    idx = np.full(cap, np.int32(0x40000000))   # OOB pad -> dropped
    idx[:spec.size] = spec
    val = np.zeros(cap, np.uint8)
    val[:spec.size] = codes_padded[spec]
    return unpack_codes(jnp.asarray(pack_codes_2bit(codes_padded)),
                        jnp.asarray(idx), jnp.asarray(val),
                        jnp.int32(m_real))
