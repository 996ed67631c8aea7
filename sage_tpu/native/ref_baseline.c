/* ref_baseline: faithful single-threaded C re-implementation of the
 * reference Rust engine's hot search loop, used ONLY to measure a CPU
 * baseline denominator for bench.py (the image has no Rust toolchain, so
 * the reference binary itself cannot be built; this mirrors its exact
 * algorithm and data layout so its single-core spectra/s stands in for
 * Rust Sage's, scaled by the core count documented in BASELINE.md).
 *
 * Mirrored behavior (file:line cites into /root/reference):
 *   - bucketed fragment index query      crates/sage/src/database.rs:402-536
 *   - binary_search_slice semantics      crates/sage/src/database.rs:549-561
 *   - preliminary candidate counting     crates/sage/src/scoring.rs:335-382
 *   - trim_hits K-select (PreScore Ord)  crates/sage/src/scoring.rs:311-329
 *   - full rescore / hyperscore / runs   crates/sage/src/scoring.rs:675-793
 *   - select_most_intense_peak           crates/sage/src/spectrum.rs:134-159
 *
 * Input: one binary dump (see bench.py:write_baseline_dump for layout).
 * Output: one JSON line {"n_spectra", "psms", "seconds", "spectra_per_s"}.
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef struct {
    uint32_t pep;
    float mz;
} Theo; /* the reference's 8-byte Theoretical (database.rs:366-372) */

typedef struct {
    uint16_t matched;
    uint32_t peptide;
    uint8_t charge;
    int8_t iso;
} PreScore;

typedef struct {
    uint32_t peptide;
    uint16_t matched_b, matched_y;
    float summed_b, summed_y;
    int longest_b, longest_y;
    double hyperscore;
    float ppm_difference;
} Score;

/* ---- binary_search_slice (database.rs:549-561) ---- */
static inline size_t pp_f32_less(const float *a, size_t n, float v) {
    size_t lo = 0, hi = n;
    while (lo < hi) {
        size_t mid = (lo + hi) >> 1;
        if (a[mid] < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}
static inline size_t pp_f32_le(const float *a, size_t n, float v) {
    size_t lo = 0, hi = n;
    while (lo < hi) {
        size_t mid = (lo + hi) >> 1;
        if (a[mid] <= v) lo = mid + 1; else hi = mid;
    }
    return lo;
}
static inline void bss_f32(const float *a, size_t n, float lo, float hi,
                           size_t *l, size_t *r) {
    size_t li = pp_f32_less(a, n, lo);
    if (li > 0) li -= 1;
    *l = li;
    *r = pp_f32_le(a + li, n - li, hi) + li;
}
static inline size_t pp_pep_less(const Theo *a, size_t n, uint32_t v) {
    size_t lo = 0, hi = n;
    while (lo < hi) {
        size_t mid = (lo + hi) >> 1;
        if (a[mid].pep < v) lo = mid + 1; else hi = mid;
    }
    return lo;
}
static inline size_t pp_pep_le(const Theo *a, size_t n, uint32_t v) {
    size_t lo = 0, hi = n;
    while (lo < hi) {
        size_t mid = (lo + hi) >> 1;
        if (a[mid].pep <= v) lo = mid + 1; else hi = mid;
    }
    return lo;
}

/* tolerance bounds (mass.rs:21-36); f32 arithmetic like the Rust.
 * kind: 0 = ppm, 1 = Da */
static inline void tol_bounds(float center, int kind, float lo_t,
                              float hi_t, float *lo, float *hi) {
    if (kind == 0) {
        *lo = center + center * lo_t / 1e6f;
        *hi = center + center * hi_t / 1e6f;
    } else {
        *lo = center + lo_t;
        *hi = center + hi_t;
    }
}

/* lnfact Stirling with the reference's n=0 -> 1.0 quirk
 * (scoring.rs:169-177) */
static inline double lnfact(uint16_t n) {
    if (n == 0) return 1.0;
    double d = (double)n;
    return d * log(d) - d + 0.5 * log(d) + 0.5 * log(2.0 * M_PI * d);
}

/* PreScore derived Ord: (matched, peptide, charge, iso) lexicographic
 * (scoring.rs:43-49) */
static inline int pre_lt(const PreScore *a, const PreScore *b) {
    if (a->matched != b->matched) return a->matched < b->matched;
    if (a->peptide != b->peptide) return a->peptide < b->peptide;
    if (a->charge != b->charge) return a->charge < b->charge;
    return a->iso < b->iso;
}

/* bounded min-heap keeping the k LARGEST PreScores (heap.rs:7-28) */
static void heap_sift_down(PreScore *h, size_t k, size_t i) {
    for (;;) {
        size_t l = 2 * i + 1, r = 2 * i + 2, s = i;
        if (l < k && pre_lt(&h[l], &h[s])) s = l;
        if (r < k && pre_lt(&h[r], &h[s])) s = r;
        if (s == i) return;
        PreScore t = h[i]; h[i] = h[s]; h[s] = t;
        i = s;
    }
}

/* select_most_intense_peak (spectrum.rs:134-159): >= keeps the LAST max */
static inline int most_intense(const float *masses, const float *intens,
                               size_t n, float lo, float hi, float *pm,
                               float *pi) {
    size_t l, r;
    bss_f32(masses, n, lo, hi, &l, &r);
    int found = 0;
    float max_int = 0.0f;
    for (size_t i = l; i < r; i++) {
        if (masses[i] >= lo && masses[i] <= hi && intens[i] >= max_int) {
            max_int = intens[i];
            *pm = masses[i];
            *pi = intens[i];
            found = 1;
        }
    }
    return found;
}

static void *xread(FILE *f, size_t sz) {
    void *p = malloc(sz ? sz : 1);
    if (sz && fread(p, 1, sz, f) != sz) {
        fprintf(stderr, "short read\n");
        exit(1);
    }
    return p;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: ref_baseline <dump.bin>\n");
        return 1;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }

    int64_t n_frag, n_buckets, n_pep;
    int32_t bucket_size, L;
    if (fread(&n_frag, 8, 1, f) + fread(&n_buckets, 8, 1, f) +
        fread(&bucket_size, 4, 1, f) + fread(&n_pep, 8, 1, f) +
        fread(&L, 4, 1, f) != 5) { fprintf(stderr, "hdr\n"); return 1; }

    float *frag_mz = xread(f, (size_t)n_frag * 4);
    uint32_t *frag_pep = xread(f, (size_t)n_frag * 4);
    float *bucket_min = xread(f, (size_t)n_buckets * 4);
    float *mono = xread(f, (size_t)n_pep * 4);
    float *nterm = xread(f, (size_t)n_pep * 4);
    int32_t *lens = xread(f, (size_t)n_pep * 4);
    float *resmass = xread(f, (size_t)n_pep * (size_t)L * 4);

    /* interleave to the reference's AoS Theoretical layout so memory
     * behavior matches (database.rs:366-372) */
    Theo *frags = malloc((size_t)n_frag * sizeof(Theo));
    for (int64_t i = 0; i < n_frag; i++) {
        frags[i].pep = frag_pep[i];
        frags[i].mz = frag_mz[i];
    }
    free(frag_mz); free(frag_pep);

    float prec_lo_t, prec_hi_t, frag_lo_t, frag_hi_t;
    int32_t prec_kind, frag_kind;
    int32_t min_matched_peaks, report_psms, n_spectra, reps;
    if (fread(&prec_kind, 4, 1, f) + fread(&prec_lo_t, 4, 1, f) +
        fread(&prec_hi_t, 4, 1, f) + fread(&frag_kind, 4, 1, f) +
        fread(&frag_lo_t, 4, 1, f) + fread(&frag_hi_t, 4, 1, f) +
        fread(&min_matched_peaks, 4, 1, f) + fread(&report_psms, 4, 1, f) +
        fread(&n_spectra, 4, 1, f) + fread(&reps, 4, 1, f) != 10) {
        fprintf(stderr, "params\n"); return 1;
    }

    int32_t *sp_npeaks = malloc((size_t)n_spectra * 4);
    int32_t *sp_charge = malloc((size_t)n_spectra * 4);
    float *sp_precmass = malloc((size_t)n_spectra * 4);
    float **sp_masses = malloc((size_t)n_spectra * sizeof(float *));
    float **sp_intens = malloc((size_t)n_spectra * sizeof(float *));
    for (int s = 0; s < n_spectra; s++) {
        if (fread(&sp_npeaks[s], 4, 1, f) + fread(&sp_charge[s], 4, 1, f) +
            fread(&sp_precmass[s], 4, 1, f) != 3) {
            fprintf(stderr, "spec hdr\n"); return 1;
        }
        sp_masses[s] = xread(f, (size_t)sp_npeaks[s] * 4);
        sp_intens[s] = xread(f, (size_t)sp_npeaks[s] * 4);
    }
    fclose(f);

    int verbose = argc > 2 && strcmp(argv[2], "-v") == 0;

    int64_t total_psms = 0;
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);

    for (int rep = 0; rep < reps; rep++) {
    total_psms = 0;
    for (int s = 0; s < n_spectra; s++) {
        const float *masses = sp_masses[s];
        const float *intens = sp_intens[s];
        size_t n_peaks = (size_t)sp_npeaks[s];
        float prec_mass = sp_precmass[s];
        int z = sp_charge[s];
        /* max_fragment_charge(None, z) (scoring.rs:234-247) */
        int maxz = z < 2 ? 2 : z;

        float prec_lo, prec_hi;
        tol_bounds(prec_mass, prec_kind, prec_lo_t, prec_hi_t, &prec_lo,
                   &prec_hi);
        size_t pre_lo, pre_hi;
        bss_f32(mono, (size_t)n_pep, prec_lo, prec_hi, &pre_lo, &pre_hi);

        /* preliminary pass: dense slot array (scoring.rs:350-375) */
        size_t potential = pre_hi - pre_lo + 1;
        PreScore *prelim = calloc(potential, sizeof(PreScore));
        for (size_t pk = 0; pk < n_peaks; pk++) {
            for (int zc = 1; zc < maxz; zc++) {
                float mass = masses[pk] * (float)zc;
                float flo, fhi;
                tol_bounds(mass, frag_kind, frag_lo_t, frag_hi_t, &flo,
                           &fhi);
                size_t bl, br;
                bss_f32(bucket_min, (size_t)n_buckets, flo, fhi, &bl, &br);
                for (size_t page = bl; page < br; page++) {
                    size_t li = page * (size_t)bucket_size;
                    size_t ri = li + (size_t)bucket_size;
                    if (ri > (size_t)n_frag) ri = (size_t)n_frag;
                    const Theo *sl = frags + li;
                    size_t sn = ri - li;
                    /* inner bss by peptide index */
                    size_t il = pp_pep_less(sl, sn, (uint32_t)pre_lo);
                    if (il > 0) il -= 1;
                    size_t ir = pp_pep_le(sl + il, sn - il,
                                          (uint32_t)pre_hi) + il;
                    for (size_t i = il; i < ir; i++) {
                        uint32_t p = sl[i].pep;
                        /* edge-bucket precursor check
                         * (database.rs:514-534) */
                        if (!((p > pre_lo ||
                               (p == pre_lo && mono[p] >= prec_lo)) &&
                              (p < pre_hi ||
                               (p == pre_hi && mono[p] <= prec_hi)) &&
                              sl[i].mz >= flo && sl[i].mz <= fhi))
                            continue;
                        PreScore *sc = &prelim[p - pre_lo];
                        if (sc->matched == 0) {
                            sc->peptide = p;
                            sc->charge = (uint8_t)z;
                            sc->iso = 0;
                        }
                        sc->matched++;
                    }
                }
            }
        }

        /* trim_hits: k = 50.clamp(min(2*report_psms, n), n)
         * (scoring.rs:311-329) */
        size_t n_pre = potential;
        size_t klo = (size_t)(2 * report_psms);
        if (klo > n_pre) klo = n_pre;
        size_t k = 50;
        if (k < klo) k = klo;
        if (k > n_pre) k = n_pre;

        PreScore *top = malloc((k ? k : 1) * sizeof(PreScore));
        size_t filled = 0;
        for (size_t i = 0; i < n_pre; i++) {
            if (filled < k) {
                top[filled++] = prelim[i];
                if (filled == k)
                    for (size_t j = k / 2; j-- > 0;)
                        heap_sift_down(top, k, j);
            } else if (pre_lt(&top[0], &prelim[i])) {
                top[0] = prelim[i];
                heap_sift_down(top, k, 0);
            }
        }
        free(prelim);

        /* full rescore of top-K (scoring.rs:478-595, 675-767) */
        double *best_scores = malloc(
            (size_t)(report_psms > 0 ? report_psms : 1) * sizeof(double));
        size_t n_best = 0; /* bounded min-select of report_psms scores */
        Score best;
        memset(&best, 0, sizeof(best));
        best.hyperscore = -1e300;
        for (size_t c = 0; c < filled; c++) {
            if (top[c].matched == 0) continue;
            uint32_t p = top[c].peptide;
            int n_ions = lens[p] - 1;
            if (n_ions < 1) continue;
            const float *rm = resmass + (size_t)p * (size_t)L;
            Score sc;
            memset(&sc, 0, sizeof(sc));
            sc.peptide = p;
            /* Run trackers (scoring.rs:771-793). Run::default() has
             * last == 0, so a first match at ion index 0 is silently
             * swallowed by the `self.last == index` early-return — a
             * reference quirk both engines must share. */
            int b_start = 0, b_len = 0, b_last = 0, b_longest = 0;
            int y_start = 0, y_len = 0, y_last = 0, y_longest = 0;
            /* b series then y series, sequential f32 cumsum
             * (ion_series.rs:44-86) */
            for (int series = 0; series < 2; series++) {
                float acc = series == 0 ? nterm[p]
                                        : (float)(mono[p] - nterm[p]);
                for (int idx = 0; idx < n_ions; idx++) {
                    acc = series == 0 ? acc + rm[idx] : acc - rm[idx];
                    for (int zc = 1; zc < maxz; zc++) {
                        float mz = acc / (float)zc;
                        float flo, fhi;
                        tol_bounds(mz, frag_kind, frag_lo_t, frag_hi_t,
                                   &flo, &fhi);
                        float pm, pi;
                        if (!most_intense(masses, intens, n_peaks, flo,
                                          fhi, &pm, &pi))
                            continue;
                        sc.ppm_difference +=
                            pi * fabsf(mz - pm) * 2e6f / (mz + pm);
                        if (series == 0) {
                            sc.matched_b++;
                            sc.summed_b += pi;
                            if (b_last != idx) {
                                if (b_start + b_len == idx) b_len++;
                                else { b_start = idx; b_len = 1; }
                                if (b_len > b_longest) b_longest = b_len;
                                b_last = idx;
                            }
                        } else {
                            sc.matched_y++;
                            sc.summed_y += pi;
                            if (y_last != idx) {
                                if (y_start + y_len == idx) y_len++;
                                else { y_start = idx; y_len = 1; }
                                if (y_len > y_longest) y_longest = y_len;
                                y_last = idx;
                            }
                        }
                    }
                }
            }
            sc.longest_b = b_longest;
            sc.longest_y = y_longest;
            /* SageHyperScore (scoring.rs:179-201) */
            double i64v = (double)(sc.summed_b + 1.0f) *
                          (double)(sc.summed_y + 1.0f);
            double hs = log(i64v) + lnfact(sc.matched_b) +
                        lnfact(sc.matched_y);
            sc.hyperscore = isfinite(hs) ? hs : 255.0;
            if (sc.matched_b + sc.matched_y <
                (uint16_t)min_matched_peaks)
                continue;
            if (sc.hyperscore > best.hyperscore) best = sc;
            /* keep top report_psms hyperscores (build_features sort) */
            if (n_best < (size_t)report_psms) {
                best_scores[n_best++] = sc.hyperscore;
            } else {
                size_t mi = 0;
                for (size_t j = 1; j < n_best; j++)
                    if (best_scores[j] < best_scores[mi]) mi = j;
                if (n_best && sc.hyperscore > best_scores[mi])
                    best_scores[mi] = sc.hyperscore;
            }
        }
        free(top);
        free(best_scores);
        total_psms += (int64_t)n_best;
        if (verbose && rep == 0) {
            if (n_best)
                printf("%d %u %d %d %d %d %.10f\n", s, best.peptide,
                       (int)best.matched_b, (int)best.matched_y,
                       best.longest_b, best.longest_y, best.hyperscore);
            else
                printf("%d -1 0 0 0 0 0\n", s);
        }
    }
    }

    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    printf("{\"n_spectra\": %d, \"reps\": %d, \"psms\": %lld, "
           "\"seconds\": %.4f, \"spectra_per_s\": %.2f}\n",
           n_spectra, reps, (long long)total_psms, dt,
           (double)n_spectra * reps / dt);
    return 0;
}
