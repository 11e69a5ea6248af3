/* 2-bit code-plane pack (native fast path of utils/pack2.pack_codes_2bit).
 *
 * Layout contract (shared with the numpy SWAR fallback and the device
 * unpack in utils/pack2.py): output byte j carries codes 4j..4j+3 at bit
 * positions 0,2,4,6. Only the low 2 bits of each input code survive —
 * specials (N=4, SEP=5) alias and are restored by the caller's side
 * channel. Input length must be a multiple of 4.
 *
 * One 8-byte SWAR step emits 2 output bytes; gcc -O3 vectorizes the loop
 * to ~5-10 GB/s, ~10x the numpy multi-pass fallback (~0.45 GB/s measured
 * — each numpy pass materializes an array). Little-endian layout assumed
 * (every deployment target of this engine).
 */

#include <stdint.h>

void pack_codes_2bit(const unsigned char *in, long n, unsigned char *out)
{
    long words = n / 8;
    const uint64_t *w = (const uint64_t *)in;
    uint16_t *o = (uint16_t *)out;
    for (long i = 0; i < words; i++) {
        uint64_t x = w[i] & 0x0303030303030303ULL;
        x = (x | (x >> 6)) & 0x000F000F000F000FULL;
        x = (x | (x >> 12)) & 0x000000FF000000FFULL;
        x = (x | (x >> 24)) & 0x000000000000FFFFULL;
        o[i] = (uint16_t)x;
    }
    if (n % 8) { /* n % 4 == 0, so the tail is exactly 4 codes -> 1 byte */
        long base = words * 8;
        out[n / 4 - 1] = (unsigned char)((in[base] & 3)
                                         | ((in[base + 1] & 3) << 2)
                                         | ((in[base + 2] & 3) << 4)
                                         | ((in[base + 3] & 3) << 6));
    }
}
