/* Native helpers for bit-exact float32 sequential arithmetic.
 *
 * The reference engine accumulates peptide masses and spectrum statistics
 * with sequential scalar f32 additions (e.g. peptide.rs:360-372 in the
 * reference repo). NumPy's pairwise summation rounds differently, so the
 * host-side database build uses these routines to reproduce the exact
 * f32 values that decide tolerance-window membership downstream.
 *
 * Built with: cc -O2 -shared -fPIC seqf32.c -o _seqf32.so
 */

#include <stdint.h>

/* out[i] = init + vals[i*stride] + vals[i*stride+1] + ... (lens[i] terms),
 * accumulated strictly left-to-right in float32. */
void seq_f32_sum_rows(const float *vals, const int32_t *lens, int64_t n_rows,
                      int64_t stride, float init, float *out) {
  for (int64_t i = 0; i < n_rows; i++) {
    float acc = init;
    const float *row = vals + i * stride;
    int32_t len = lens[i];
    for (int32_t j = 0; j < len; j++) {
      acc += row[j];
    }
    out[i] = acc;
  }
}

/* Sequential f32 sum of a single vector. */
float seq_f32_sum(const float *vals, int64_t n) {
  float acc = 0.0f;
  for (int64_t i = 0; i < n; i++) {
    acc += vals[i];
  }
  return acc;
}

/* Sequential f32 prefix sums (inclusive), one row at a time:
 * out[i*stride + j] = init[i] + vals[i*stride] + ... + vals[i*stride+j]. */
void seq_f32_cumsum_rows(const float *vals, const float *init,
                         const int32_t *lens, int64_t n_rows, int64_t stride,
                         float *out) {
  for (int64_t i = 0; i < n_rows; i++) {
    float acc = init[i];
    const float *row = vals + i * stride;
    float *orow = out + i * stride;
    int32_t len = lens[i];
    for (int32_t j = 0; j < len; j++) {
      acc += row[j];
      orow[j] = acc;
    }
    for (int32_t j = len; j < stride; j++) {
      orow[j] = acc;
    }
  }
}
