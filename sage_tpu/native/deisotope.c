/* Deisotoping / charge-state deconvolution.
 *
 * Port of the reference's two-pointer C13-envelope walk
 * (crates/sage/src/spectrum.rs:179-227 in the reference repo) — a
 * sequential, data-dependent loop that belongs on the host in native
 * code. All arithmetic is float32 to preserve bit-exact tolerance
 * comparisons.
 *
 * Built with: cc -O2 -shared -fPIC deisotope.c -o _deisotope.so
 */

#include <math.h>
#include <stdint.h>

static const float NEUTRON = 1.00335f;

/* mz/inten: peaks sorted by m/z ascending (length n).
 * Outputs (caller-allocated):
 *   out_intensity: rolled-up envelope intensities (init = inten copy)
 *   out_charge:    assigned charge, 0 = none
 *   out_envelope:  index of parent isotopic peak, -1 = none
 */
void deisotope(const float *mz, const float *inten, int32_t n,
               int32_t max_charge, float ppm, float min_mz,
               float *out_intensity, int8_t *out_charge,
               int32_t *out_envelope) {
  for (int32_t i = 0; i < n; i++) {
    out_intensity[i] = inten[i];
    out_charge[i] = 0;
    out_envelope[i] = -1;
  }
  for (int32_t i = n - 1; i >= 0; i--) {
    int32_t j = i > 0 ? i - 1 : 0;
    while (mz[i] - mz[j] <= NEUTRON + (ppm * mz[i]) / 1000000.0f &&
           mz[j] >= min_mz) {
      float delta = mz[i] - mz[j];
      float tol = (ppm * mz[i]) / 1000000.0f;
      for (int32_t charge = 1; charge <= max_charge; charge++) {
        float iso = NEUTRON / (float)charge;
        if (fabsf(delta - iso) <= tol && inten[i] < inten[j]) {
          /* don't reassign a peak already in an envelope at another charge */
          if (out_charge[i] != 0 && out_charge[i] != (int8_t)charge) {
            continue;
          }
          out_intensity[j] += out_intensity[i];
          out_charge[j] = (int8_t)charge;
          out_charge[i] = (int8_t)charge;
          out_envelope[i] = j;
        }
      }
      /* reference: j = j.saturating_sub(1); if j == 0 { break; } */
      if (j == 0) {
        break;
      }
      j -= 1;
      if (j == 0) {
        break;
      }
    }
  }
}
