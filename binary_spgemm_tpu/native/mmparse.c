/* Fast Matrix-Market coordinate-body parser.
 *
 * Native equivalent of the reference's C ingest tier (readCOO's fscanf loop,
 * final/utils.c:66-71, and the vendored NIST mmio): parses the entry body of a
 * coordinate file — `nnz` lines of `row col [value...]` — into uint32 arrays.
 * Only the first two fields of each line are used (the reference's
 * fscanf("%u %u") semantics); any further fields are skipped.
 *
 * Build: cc -O3 -shared -fPIC -o libmmparse.so mmparse.c
 * Called from Python via ctypes (binary_spgemm_tpu/native/__init__.py).
 */
#include <stdint.h>
#include <stddef.h>

/* Parse up to `nnz` coordinate entries from buf[0..len).  `fields` is the
 * number of whitespace-separated fields per entry (>= 2); fields beyond the
 * first two are skipped.  Writes 1-based values as found (caller shifts).
 * Returns the number of entries parsed, or -1 on malformed input. */
long mm_parse_pairs(const char *buf, long len, long nnz, int fields,
                    uint32_t *rows, uint32_t *cols) {
    const char *p = buf, *end = buf + len;
    long count = 0;
    while (count < nnz) {
        uint32_t vals[2];
        for (int f = 0; f < fields; f++) {
            /* skip whitespace / newlines */
            while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' ||
                               *p == '\r'))
                p++;
            if (p >= end)
                return (f == 0) ? count : -1; /* clean EOF only between entries */
            if (f < 2) {
                if (*p < '0' || *p > '9')
                    return -1;
                uint64_t v = 0;
                while (p < end && *p >= '0' && *p <= '9') {
                    v = v * 10u + (uint64_t)(*p - '0');
                    if (v > 0xffffffffu)
                        return -1;
                    p++;
                }
                vals[f] = (uint32_t)v;
            } else {
                /* skip a value token (real/integer field) */
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n' &&
                       *p != '\r')
                    p++;
            }
        }
        rows[count] = vals[0];
        cols[count] = vals[1];
        count++;
    }
    return count;
}

/* Format `n` coordinate pairs as 1-based "row col\n" ASCII into out (caller
 * sizes it: 22 bytes/pair is always enough).  Returns bytes written. */
long mm_format_pairs(const uint32_t *rows, const uint32_t *cols, long n,
                     char *out) {
    char *q = out;
    for (long i = 0; i < n; i++) {
        for (int f = 0; f < 2; f++) {
            uint32_t v = (f == 0 ? rows[i] : cols[i]) + 1u;
            char tmp[10];
            int k = 0;
            do {
                tmp[k++] = (char)('0' + v % 10u);
                v /= 10u;
            } while (v);
            while (k)
                *q++ = tmp[--k];
            *q++ = (f == 0) ? ' ' : '\n';
        }
    }
    return (long)(q - out);
}

/* Stable COO->CSR grouping (native tier of formats/bcsr.py::coo_to_csr_stable;
 * same histogram / exclusive-scan / write-cursor-scatter structure as the
 * reference's coo2csc, final/coo2csc.c:33-62, but grouping by the FIRST index
 * — the transpose semantics live in the caller, io/mmio.py).  Entries sharing
 * a row keep input order; duplicates are kept.  Returns 0, or -1 if any row
 * id is out of range. */
long coo2csr_stable(const uint32_t *rows, const uint32_t *cols, long nnz,
                    long n_rows, uint32_t *indptr /* n_rows+1 */,
                    uint32_t *indices /* nnz */) {
    for (long i = 0; i <= n_rows; i++)
        indptr[i] = 0;
    for (long e = 0; e < nnz; e++) {
        if ((long)rows[e] >= n_rows)
            return -1;
        indptr[rows[e] + 1]++;
    }
    for (long i = 0; i < n_rows; i++)
        indptr[i + 1] += indptr[i];
    /* write-cursor scatter on indptr[0..n_rows-1], then shift back */
    for (long e = 0; e < nnz; e++)
        indices[indptr[rows[e]]++] = cols[e];
    for (long i = n_rows; i > 0; i--)
        indptr[i] = indptr[i - 1];
    indptr[0] = 0;
    return 0;
}
