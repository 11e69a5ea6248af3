/* Native match-listing formatter — the reference's buffered PrintMatch
 * (slamem.c / output layer, SURVEY.md §2 "Output writer") as a batch
 * renderer. Python-side per-line f-string formatting runs ~1M lines/s;
 * chr-scale outputs reach tens of millions of matches, so the hot
 * formatter is native like the reference's, with report/format.py holding
 * the (byte-parity-critical) layout in one place for both paths.
 *
 * Layout contract (must match report/format.py exactly):
 *   single-ref line : "%8ld  %8ld  %8ld\n"           (rp, qp, len)
 *   multi-ref line  : "  %-*s  %8ld  %8ld  %8ld\n"   (name padded to name_w)
 * Numbers wider than 8 digits extend the field (printf semantics), exactly
 * like Python's "{:>8}".
 */

#include <stdint.h>
#include <stdio.h>
#include <string.h>

/* Render n single-ref lines into out (caller-sized); returns bytes written
 * or -1 if the buffer would overflow. */
long fmt_lines_single(const int64_t *rp, const int64_t *qp,
                      const int64_t *ln, long n, char *out, long cap) {
    long off = 0;
    for (long i = 0; i < n; i++) {
        if (off + 64 > cap) return -1;
        int w = snprintf(out + off, (size_t)(cap - off),
                         "%8lld  %8lld  %8lld\n",
                         (long long)rp[i], (long long)qp[i],
                         (long long)ln[i]);
        if (w < 0) return -1;
        off += w;
    }
    return off;
}

/* Render n multi-ref lines. names = concatenated name bytes; name_off/len
 * give each ref sequence's slice; seq[i] selects the name for line i;
 * name_w = pad width for the name column. */
long fmt_lines_multi(const int64_t *seq, const int64_t *rp,
                     const int64_t *qp, const int64_t *ln, long n,
                     const char *names, const int64_t *name_off,
                     const int64_t *name_len, long name_w,
                     char *out, long cap) {
    long off = 0;
    for (long i = 0; i < n; i++) {
        long s = (long)seq[i];
        long nl = (long)name_len[s];
        if (off + 64 + name_w + nl > cap) return -1;
        out[off++] = ' ';
        out[off++] = ' ';
        memcpy(out + off, names + name_off[s], (size_t)nl);
        off += nl;
        for (long p = nl; p < name_w; p++) out[off++] = ' ';
        int w = snprintf(out + off, (size_t)(cap - off),
                         "  %8lld  %8lld  %8lld\n",
                         (long long)rp[i], (long long)qp[i],
                         (long long)ln[i]);
        if (w < 0) return -1;
        off += w;
    }
    return off;
}
