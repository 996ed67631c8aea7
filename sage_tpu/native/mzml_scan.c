/* Fast mzML structure scanner.
 *
 * Single-pass tag walk over an mzML document extracting, per spectrum,
 * the exact fields the Python state machine (sage_tpu/io/mzml.py,
 * mirroring /root/reference/crates/sage-cloudpath/src/mzml.rs) consumes:
 * id, ms level, centroid/profile, TIC (0 -> skip), scan start time +
 * unit, injection time, precursors (selected ion m/z / charge /
 * intensity, isolation window target/lo/hi, inverse ion mobility from
 * selectedIon OR scan, spectrumRef), and the byte ranges of base64
 * binary payloads with their CV flags (mz/intensity/noise, f32/f64,
 * zlib). Base64+zlib decoding stays in Python (C-backed stdlib) — the
 * XML walk is the bottleneck this replaces.
 *
 * State rules intentionally mirror the Python parser, including its
 * running compression/dtype state that persists across binaryDataArray
 * elements. On anything structurally surprising (>MAXP precursors,
 * >MAXA arrays, unterminated tags) the scanner returns -1 and the
 * caller falls back to the Python parser.
 */

#define _GNU_SOURCE  /* strtod_l, newlocale */
#include <locale.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* locale-independent strtod: XML numbers are always C-locale formatted,
 * but strtod honors LC_NUMERIC (set by unrelated libraries) */
static locale_t c_locale(void) {
    static locale_t loc = (locale_t)0;
    if (loc == (locale_t)0) loc = newlocale(LC_ALL_MASK, "C", (locale_t)0);
    return loc;
}

#define MAXP 4
#define MAXA 4

typedef struct {
    int64_t id_off, id_len;
    int64_t ms_level;   /* 0 = unset */
    int64_t centroid;   /* -1 unknown, 0 profile, 1 centroid */
    int64_t sst_unit;   /* 0 none, 1 seconds, 2 minutes, -1 unknown-unit */
    int64_t skip;       /* TIC == 0 */
    int64_t n_prec, n_arr;
    double tic, sst, iit;
    /* precursors */
    double p_mz[MAXP], p_int[MAXP], p_im[MAXP];
    double p_iso_target[MAXP], p_iso_lo[MAXP], p_iso_hi[MAXP];
    int64_t p_charge[MAXP];       /* -1 = none */
    int64_t p_has_int[MAXP], p_has_im[MAXP], p_has_lo[MAXP], p_has_hi[MAXP];
    int64_t p_ref_off[MAXP], p_ref_len[MAXP];
    /* binary arrays */
    int64_t a_kind[MAXA];  /* 0 mz, 1 intensity, 2 noise */
    int64_t a_f64[MAXA], a_zlib[MAXA];
    int64_t a_off[MAXA], a_len[MAXA];
} rec_t;

static const char *memfind(const char *p, const char *end, const char *pat,
                           size_t n) {
    if (n == 0 || (size_t)(end - p) < n) return NULL;
    const char *last = end - n;
    for (; p <= last; p++) {
        if (p[0] == pat[0] && memcmp(p, pat, n) == 0) return p;
    }
    return NULL;
}

/* find attribute value inside tag bytes [tag, tag_end); returns length,
 * sets *out to the value start; -1 if absent */
static long attr(const char *tag, const char *tag_end, const char *name,
                 const char **out) {
    size_t n = strlen(name);
    const char *p = tag;
    while ((p = memfind(p, tag_end, name, n)) != NULL) {
        const char *q = p + n;
        /* require NAME="..." with optional spaces, and a non-name char
         * before (so "unitAccession" doesn't match "accession") */
        if (p > tag && (p[-1] == ' ' || p[-1] == '\t' || p[-1] == '\n')) {
            while (q < tag_end && (*q == ' ' || *q == '\t')) q++;
            if (q < tag_end && *q == '=') {
                q++;
                while (q < tag_end && (*q == ' ' || *q == '\t')) q++;
                if (q < tag_end && (*q == '"' || *q == '\'')) {
                    char quote = *q++;
                    const char *e = memchr(q, quote, tag_end - q);
                    if (!e) return -1;
                    *out = q;
                    return (long)(e - q);
                }
            }
        }
        p = p + n;
    }
    return -1;
}

static double attr_f(const char *tag, const char *tag_end, const char *name,
                     int *ok) {
    const char *v;
    long n = attr(tag, tag_end, name, &v);
    if (n < 0) { *ok = 0; return 0.0; }
    char buf[64];
    if (n >= (long)sizeof(buf)) n = sizeof(buf) - 1;
    memcpy(buf, v, n);
    buf[n] = 0;
    *ok = 1;
    return strtod_l(buf, NULL, c_locale());
}

static int tag_is(const char *name, long nlen, const char *want) {
    size_t w = strlen(want);
    /* match local name with or without namespace prefix */
    if ((size_t)nlen == w && memcmp(name, want, w) == 0) return 1;
    if ((size_t)nlen > w && name[nlen - w - 1] == ':' &&
        memcmp(name + nlen - w, want, w) == 0)
        return 1;
    return 0;
}

long mzml_scan(const char *d, int64_t n, rec_t *out, int64_t max_rec) {
    const char *p = d, *end = d + n;
    int64_t count = 0;

    int in_spectrum = 0, in_scan = 0, in_sel = 0, in_iso = 0, in_bda = 0,
        in_prec = 0;
    /* running binary-array state persists across arrays (parser parity) */
    int compression = 0, dtype_f64 = 1;
    int binary_kind = -2; /* -2 unset, -1 unknown-cv, 0 mz, 1 int, 2 noise */

    rec_t *r = NULL;
    int cur_prec = -1;
    int prec_opens = 0; /* <precursor> elements seen in this spectrum */

    while (p < end) {
        const char *lt = memchr(p, '<', end - p);
        if (!lt) break;
        if (lt + 1 >= end) break;
        if (lt[1] == '?' || lt[1] == '!') { /* PI/comment/doctype */
            const char *gt = memchr(lt, '>', end - lt);
            if (!gt) return -1;
            p = gt + 1;
            continue;
        }
        const char *gt = memchr(lt, '>', end - lt);
        if (!gt) return -1;
        int closing = lt[1] == '/';
        const char *name = lt + (closing ? 2 : 1);
        const char *ne = name;
        while (ne < gt && *ne != ' ' && *ne != '\t' && *ne != '\n' &&
               *ne != '/' && *ne != '>')
            ne++;
        long nlen = (long)(ne - name);
        int selfclose = !closing && gt > lt && gt[-1] == '/';
        const char *tag_end = gt;

        if (!closing && tag_is(name, nlen, "spectrum")) {
            if (count >= max_rec) return -1;
            r = &out[count];
            memset(r, 0, sizeof(*r));
            r->centroid = -1;
            const char *v;
            long vl = attr(lt, tag_end, "id", &v);
            if (vl >= 0) { r->id_off = v - d; r->id_len = vl; }
            in_spectrum = 1;
            cur_prec = -1;
            prec_opens = 0;
            binary_kind = -2;
        } else if (closing && tag_is(name, nlen, "spectrum")) {
            if (r) count++;
            r = NULL;
            in_spectrum = 0;
        } else if (!in_spectrum) {
            /* outside spectra nothing else matters */
        } else if (!closing && tag_is(name, nlen, "scan")) {
            if (!selfclose) in_scan = 1;
        } else if (closing && tag_is(name, nlen, "scan")) {
            in_scan = 0;
        } else if (!closing && tag_is(name, nlen, "precursor")) {
            if (r->n_prec >= MAXP) return -1;
            cur_prec = (int)r->n_prec;
            /* reset the slot (it may be a reused slot after a discarded
             * zero-m/z precursor); a scan-level ion mobility stashed in
             * slot 0 survives only into the FIRST precursor element,
             * matching the Python parser's object lifetime */
            if (prec_opens > 0 || cur_prec != 0) {
                r->p_im[cur_prec] = 0.0;
                r->p_has_im[cur_prec] = 0;
            }
            prec_opens++;
            r->p_mz[cur_prec] = 0.0;
            r->p_int[cur_prec] = 0.0;
            r->p_has_int[cur_prec] = 0;
            r->p_iso_target[cur_prec] = 0.0;
            r->p_iso_lo[cur_prec] = 0.0;
            r->p_iso_hi[cur_prec] = 0.0;
            r->p_has_lo[cur_prec] = 0;
            r->p_has_hi[cur_prec] = 0;
            r->p_charge[cur_prec] = -1;
            r->p_ref_len[cur_prec] = 0;
            r->p_ref_off[cur_prec] = 0;
            const char *v;
            long vl = attr(lt, tag_end, "spectrumRef", &v);
            if (vl >= 0) {
                r->p_ref_off[cur_prec] = v - d;
                r->p_ref_len[cur_prec] = vl;
            }
            if (!selfclose) in_prec = 1;
        } else if (closing && tag_is(name, nlen, "precursor")) {
            /* keep only precursors with a non-zero m/z (parser parity) */
            if (cur_prec >= 0 && r->p_mz[cur_prec] != 0.0) r->n_prec++;
            cur_prec = -1;
            in_prec = 0;
        } else if (!closing && tag_is(name, nlen, "selectedIon")) {
            if (!selfclose) in_sel = 1;
        } else if (closing && tag_is(name, nlen, "selectedIon")) {
            in_sel = 0;
        } else if (!closing && tag_is(name, nlen, "isolationWindow")) {
            if (!selfclose) in_iso = 1;
        } else if (closing && tag_is(name, nlen, "isolationWindow")) {
            in_iso = 0;
        } else if (!closing && tag_is(name, nlen, "binaryDataArray")) {
            if (!selfclose) { in_bda = 1; binary_kind = -2; }
        } else if (closing && tag_is(name, nlen, "binaryDataArray")) {
            in_bda = 0;
        } else if (!closing && !selfclose && tag_is(name, nlen, "binary")) {
            const char *close = memfind(gt + 1, end, "</", 2);
            /* find the matching </binary> (binary payload has no '<') */
            if (!close) return -1;
            if (binary_kind >= 0 && !r->skip) {
                if (r->n_arr >= MAXA) return -1;
                int64_t k = r->n_arr;
                r->a_kind[k] = binary_kind;
                r->a_f64[k] = dtype_f64;
                r->a_zlib[k] = compression;
                r->a_off[k] = (gt + 1) - d;
                r->a_len[k] = close - (gt + 1);
                r->n_arr++;
            }
            binary_kind = -2;
            const char *cgt = memchr(close, '>', end - close);
            if (!cgt) return -1;
            p = cgt + 1;
            continue;
        } else if (tag_is(name, nlen, "cvParam") && !r->skip) {
            const char *acc;
            long al = attr(lt, tag_end, "accession", &acc);
            if (al == 10 && memcmp(acc, "MS:", 3) == 0) {
                int ok;
                long code = strtol(acc + 3, NULL, 10);
                if (in_bda) {
                    switch (code) {
                        case 1000574: compression = 1; break;
                        case 1000576: compression = 0; break;
                        case 1000523: dtype_f64 = 1; break;
                        case 1000521: dtype_f64 = 0; break;
                        case 1000515: binary_kind = 1; break;
                        case 1000514: binary_kind = 0; break;
                        case 1002744: binary_kind = 2; break;
                        default:
                            /* unknown array CV: mark unknown only for
                             * array-type accessions; the Python parser
                             * nulls the kind for ANY other accession */
                            binary_kind = -1;
                            break;
                    }
                } else if (in_iso && cur_prec >= 0) {
                    if (code == 1000827) {
                        double v = attr_f(lt, tag_end, "value", &ok);
                        if (ok && r->p_mz[cur_prec] == 0.0) {
                            r->p_mz[cur_prec] = v;
                            r->p_iso_target[cur_prec] = v;
                        }
                    } else if (code == 1000828) {
                        r->p_iso_lo[cur_prec] = attr_f(lt, tag_end, "value", &ok);
                        r->p_has_lo[cur_prec] = ok;
                    } else if (code == 1000829) {
                        r->p_iso_hi[cur_prec] = attr_f(lt, tag_end, "value", &ok);
                        r->p_has_hi[cur_prec] = ok;
                    }
                } else if (in_sel && cur_prec >= 0) {
                    if (code == 1000041) {
                        double v = attr_f(lt, tag_end, "value", &ok);
                        if (ok) r->p_charge[cur_prec] = (int64_t)v;
                    } else if (code == 1000744) {
                        double v = attr_f(lt, tag_end, "value", &ok);
                        if (ok && v != 0.0) r->p_mz[cur_prec] = v;
                    } else if (code == 1000042) {
                        r->p_int[cur_prec] = attr_f(lt, tag_end, "value", &ok);
                        r->p_has_int[cur_prec] = ok;
                    } else if (code == 1002815) {
                        r->p_im[cur_prec] = attr_f(lt, tag_end, "value", &ok);
                        r->p_has_im[cur_prec] = ok;
                    }
                } else if (in_scan) {
                    if (code == 1000016) {
                        r->sst = attr_f(lt, tag_end, "value", &ok);
                        const char *u;
                        long ul = attr(lt, tag_end, "unitAccession", &u);
                        if (ul == 10 && memcmp(u, "UO:0000010", 10) == 0)
                            r->sst_unit = 1;
                        else if (ul == 10 && memcmp(u, "UO:0000031", 10) == 0)
                            r->sst_unit = 2;
                        else
                            r->sst_unit = -1;
                    } else if (code == 1000927) {
                        r->iit = attr_f(lt, tag_end, "value", &ok);
                    } else if (code == 1002815) {
                        /* mobility on the scan applies to the NEXT/current
                         * precursor context (mzml.rs:275-277): stash on
                         * the next UNCOMMITTED slot — after the precursor
                         * list closed this lands in a slot that is never
                         * committed, matching the Python parser's
                         * discarded dangling Precursor object */
                        int slot = cur_prec >= 0 ? cur_prec : (int)r->n_prec;
                        if (slot < MAXP) {
                            r->p_im[slot] = attr_f(lt, tag_end, "value", &ok);
                            r->p_has_im[slot] = ok;
                        }
                    }
                } else if (!in_prec && !in_bda) {
                    /* direct child of <spectrum> */
                    if (code == 1000511) {
                        r->ms_level =
                            (int64_t)attr_f(lt, tag_end, "value", &ok);
                    } else if (code == 1000128) {
                        r->centroid = 0;
                    } else if (code == 1000127) {
                        r->centroid = 1;
                    } else if (code == 1000285) {
                        r->tic = attr_f(lt, tag_end, "value", &ok);
                        if (ok && r->tic == 0.0) r->skip = 1;
                    }
                }
            }
        }
        p = gt + 1;
    }
    return count;
}

int64_t mzml_rec_size(void) { return (int64_t)sizeof(rec_t); }

/* ---- binary payload decode: base64 -> (zlib) -> f32 ------------------- */

#include <zlib.h>

static const int8_t B64[256] = {
    /* -1 everywhere except the 64 alphabet chars and '=' (-2) */
    [0 ... 255] = -1,
    ['A'] = 0,  ['B'] = 1,  ['C'] = 2,  ['D'] = 3,  ['E'] = 4,  ['F'] = 5,
    ['G'] = 6,  ['H'] = 7,  ['I'] = 8,  ['J'] = 9,  ['K'] = 10, ['L'] = 11,
    ['M'] = 12, ['N'] = 13, ['O'] = 14, ['P'] = 15, ['Q'] = 16, ['R'] = 17,
    ['S'] = 18, ['T'] = 19, ['U'] = 20, ['V'] = 21, ['W'] = 22, ['X'] = 23,
    ['Y'] = 24, ['Z'] = 25, ['a'] = 26, ['b'] = 27, ['c'] = 28, ['d'] = 29,
    ['e'] = 30, ['f'] = 31, ['g'] = 32, ['h'] = 33, ['i'] = 34, ['j'] = 35,
    ['k'] = 36, ['l'] = 37, ['m'] = 38, ['n'] = 39, ['o'] = 40, ['p'] = 41,
    ['q'] = 42, ['r'] = 43, ['s'] = 44, ['t'] = 45, ['u'] = 46, ['v'] = 47,
    ['w'] = 48, ['x'] = 49, ['y'] = 50, ['z'] = 51, ['0'] = 52, ['1'] = 53,
    ['2'] = 54, ['3'] = 55, ['4'] = 56, ['5'] = 57, ['6'] = 58, ['7'] = 59,
    ['8'] = 60, ['9'] = 61, ['+'] = 62, ['/'] = 63, ['='] = -2,
};

static long b64_decode(const char *src, long n, unsigned char *dst) {
    /* whitespace-tolerant; returns decoded byte count or -1 */
    unsigned acc = 0;
    int bits = 0;
    long out = 0;
    for (long i = 0; i < n; i++) {
        unsigned char c = (unsigned char)src[i];
        int8_t v = B64[c];
        if (v == -1) {
            if (c == ' ' || c == '\n' || c == '\r' || c == '\t') continue;
            return -1;
        }
        if (v == -2) break; /* padding */
        acc = (acc << 6) | (unsigned)v;
        bits += 6;
        if (bits >= 8) {
            bits -= 8;
            dst[out++] = (unsigned char)(acc >> bits);
        }
    }
    return out;
}

/* Decode one <binary> payload into caller-owned f32 buffer.
 * Returns number of floats written, or -1 on error, or -2 if out_cap
 * was too small (caller retries with a bigger buffer). */
long mzml_decode_binary(const char *base, int64_t off, int64_t n,
                        int64_t is_zlib, int64_t is_f64, float *out,
                        int64_t out_cap) {
    const char *b64 = base + off;
    long max_raw = (n / 4) * 3 + 8;
    unsigned char *raw = (unsigned char *)malloc(max_raw);
    if (!raw) return -1;
    long raw_n = b64_decode(b64, n, raw);
    if (raw_n < 0) { free(raw); return -1; }

    unsigned char *plain = raw;
    long plain_n = raw_n;
    unsigned char *heap = NULL;
    if (is_zlib) {
        uLongf cap = (uLongf)(raw_n * 5 + 1024);
        for (int attempt = 0; attempt < 8; attempt++) {
            heap = (unsigned char *)realloc(heap, cap);
            if (!heap) { free(raw); return -1; }
            uLongf got = cap;
            int rc = uncompress(heap, &got, raw, (uLong)raw_n);
            if (rc == Z_OK) { plain = heap; plain_n = (long)got; break; }
            if (rc == Z_BUF_ERROR) { cap *= 4; continue; }
            free(heap); free(raw); return -1;
        }
        if (plain == raw) { free(heap); free(raw); return -1; }
    }

    long count;
    if (is_f64) {
        count = plain_n / 8;
        if (count > out_cap) { if (heap) free(heap); free(raw); return -2; }
        const double *src = (const double *)plain;
        for (long i = 0; i < count; i++) out[i] = (float)src[i];
    } else {
        count = plain_n / 4;
        if (count > out_cap) { if (heap) free(heap); free(raw); return -2; }
        memcpy(out, plain, count * 4);
    }
    if (heap) free(heap);
    free(raw);
    return count;
}
