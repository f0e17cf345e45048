/*
 * dump_golden_intra.c — golden vectors for intra predictors: random edges
 * through the reference _c kernels (aom_dsp/intrapred.c, reconintra.c).
 * Build: gcc tools/dump_golden_intra.c -I$REF -I$REFBUILD $REFBUILD/libaom.a -lm
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/aom_dsp_rtcd.h"
#include "config/av1_rtcd.h"
#include "av1/common/enums.h"
#include "av1/common/reconintra.h"

static FILE *out;
static void dump_raw(const char *name, const void *data, int elem_size,
                     int ndim, const int *dims) {
  uint32_t nl = (uint32_t)strlen(name), es = elem_size, nd = ndim;
  size_t total = 1;
  fwrite(&nl, 4, 1, out);
  fwrite(name, 1, nl, out);
  fwrite(&es, 4, 1, out);
  fwrite(&nd, 4, 1, out);
  for (int i = 0; i < ndim; i++) {
    uint32_t d = dims[i];
    fwrite(&d, 4, 1, out);
    total *= dims[i];
  }
  fwrite(data, elem_size, total, out);
}

static uint32_t state = 0xabc12345;
static uint32_t lcg(void) {
  state = state * 1103515245u + 12345u;
  return state >> 16;
}

typedef void (*Pred)(uint8_t *, ptrdiff_t, const uint8_t *, const uint8_t *);

#define P(mode, w, h) aom_##mode##_predictor_##w##x##h##_c
#define SIZES(M)                                                     \
  { P(M, 4, 4), P(M, 8, 8), P(M, 16, 16), P(M, 32, 32), P(M, 4, 8), \
    P(M, 8, 4), P(M, 16, 8), P(M, 4, 16), P(M, 64, 64), P(M, 8, 32) }

static const int ws[10] = { 4, 8, 16, 32, 4, 8, 16, 4, 64, 8 };
static const int hs[10] = { 4, 8, 16, 32, 8, 4, 8, 16, 64, 32 };

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_intra.bin", "wb");
  char name[96];
  static const Pred preds[10][10] = {
    SIZES(dc), SIZES(dc_top), SIZES(dc_left), SIZES(dc_128), SIZES(v),
    SIZES(h), SIZES(paeth), SIZES(smooth), SIZES(smooth_v), SIZES(smooth_h),
  };
  static const char *mnames[10] = { "dc", "dc_top", "dc_left", "dc_128",
                                    "v", "h", "paeth", "smooth", "smooth_v",
                                    "smooth_h" };
  static uint8_t edge_buf[260];
  uint8_t *above = edge_buf + 2; /* above[-1] = corner, above[-2] defined */
  static uint8_t left_buf[300], dst[64 * 64];
  uint8_t *left = left_buf + 2; /* left[-1], left[-2] defined (z2 reads them) */
  for (int m = 0; m < 10; m++) {
    for (int si = 0; si < 10; si++) {
      int w = ws[si], h = hs[si];
      for (int i = -2; i < 2 * w; i++) above[i] = lcg() & 255;
      for (int i = 0; i < 2 * h + 2; i++) left[i] = lcg() & 255;
      int de[3] = { 2 * w + 2, 0, 0 };
      snprintf(name, sizeof(name), "%s_%dx%d_above", mnames[m], w, h);
      dump_raw(name, above - 2, 1, 1, de);
      de[0] = 2 * h + 2;
      snprintf(name, sizeof(name), "%s_%dx%d_left", mnames[m], w, h);
      dump_raw(name, left, 1, 1, de);
      preds[m][si](dst, w, above, left);
      int dd[2] = { h, w };
      snprintf(name, sizeof(name), "%s_%dx%d_out", mnames[m], w, h);
      dump_raw(name, dst, 1, 2, dd);
    }
  }

  /* directional z1/z2/z3 with angle-derived dx/dy, upsample 0/1 */
  for (int si = 0; si < 10; si++) {
    int w = ws[si], h = hs[si];
    if (w > 32 || h > 32) continue;
    for (int up = 0; up < 2; up++) {
      for (int ai = 0; ai < 3; ai++) {
        /* edges: allocate (w+h)<<1 + 2 valid pixels, incl. [-2,-1] slots */
        for (int i = -2; i < ((w + h) << 1) + 2; i++) above[i] = lcg() & 255;
        for (int i = -2; i < ((w + h) << 1) + 2; i++) left[i] = lcg() & 255;
        int de[1] = { ((w + h) << 1) + 4 };
        int dd[2] = { h, w };

        static const int z1_angles[3] = { 23, 45, 87 };
        int dx = av1_get_dx(z1_angles[ai]);
        snprintf(name, sizeof(name), "z1_%dx%d_up%d_dx%d_above", w, h, up, dx);
        dump_raw(name, above - 2, 1, 1, de);
        av1_dr_prediction_z1_c(dst, w, w, h, above, left, up, dx, 1);
        snprintf(name, sizeof(name), "z1_%dx%d_up%d_dx%d_out", w, h, up, dx);
        dump_raw(name, dst, 1, 2, dd);

        static const int z3_angles[3] = { 187, 203, 247 };
        int dy = av1_get_dy(z3_angles[ai]);
        snprintf(name, sizeof(name), "z3_%dx%d_up%d_dy%d_left", w, h, up, dy);
        dump_raw(name, left, 1, 1, de);
        av1_dr_prediction_z3_c(dst, w, w, h, above, left, up, 1, dy);
        snprintf(name, sizeof(name), "z3_%dx%d_up%d_dy%d_out", w, h, up, dy);
        dump_raw(name, dst, 1, 2, dd);

        static const int z2_angles[3] = { 97, 113, 157 };
        int dx2 = av1_get_dx(z2_angles[ai]);
        int dy2 = av1_get_dy(z2_angles[ai]);
        for (int upl = 0; upl < 2; upl++) {
          snprintf(name, sizeof(name), "z2_%dx%d_up%d%d_a%d_above", w, h, up,
                   upl, z2_angles[ai]);
          dump_raw(name, above - 2, 1, 1, de);
          snprintf(name, sizeof(name), "z2_%dx%d_up%d%d_a%d_left", w, h, up,
                   upl, z2_angles[ai]);
          dump_raw(name, left - 2, 1, 1, de);
          av1_dr_prediction_z2_c(dst, w, w, h, above, left, up, upl, dx2, dy2);
          snprintf(name, sizeof(name), "z2_%dx%d_up%d%d_a%d_out", w, h, up,
                   upl, z2_angles[ai]);
          dump_raw(name, dst, 1, 2, dd);
        }
      }
    }
  }

  /* edge filter + upsample */
  for (int strength = 0; strength < 4; strength++) {
    for (int szi = 0; szi < 3; szi++) {
      static const int szs[3] = { 5, 17, 65 };
      int sz = szs[szi];
      static uint8_t p[160];
      for (int i = 0; i < sz; i++) p[i] = lcg() & 255;
      int de[1] = { sz };
      snprintf(name, sizeof(name), "ef_s%d_sz%d_in", strength, sz);
      dump_raw(name, p, 1, 1, de);
      av1_filter_intra_edge_c(p, sz, strength);
      snprintf(name, sizeof(name), "ef_s%d_sz%d_out", strength, sz);
      dump_raw(name, p, 1, 1, de);
    }
  }
  for (int szi = 0; szi < 3; szi++) {
    static const int szs[3] = { 4, 8, 16 };
    int sz = szs[szi];
    static uint8_t buf[64];
    uint8_t *p = buf + 16;
    for (int i = -1; i < sz; i++) p[i] = lcg() & 255;
    int de[1] = { sz + 1 };
    snprintf(name, sizeof(name), "ue_sz%d_in", sz);
    dump_raw(name, p - 1, 1, 1, de);
    av1_upsample_intra_edge_c(p, sz);
    int do_[1] = { 2 * sz + 1 };
    snprintf(name, sizeof(name), "ue_sz%d_out", sz);
    dump_raw(name, p - 2, 1, 1, do_);
  }

  /* filter intra */
  for (int mode = 0; mode < 5; mode++) {
    int w = 8, h = 8;
    for (int i = -1; i < w; i++) above[i] = lcg() & 255;
    for (int i = 0; i < h; i++) left[i] = lcg() & 255;
    int de[1] = { w + 1 };
    snprintf(name, sizeof(name), "fi_m%d_above", mode);
    dump_raw(name, above - 1, 1, 1, de);
    de[0] = h;
    snprintf(name, sizeof(name), "fi_m%d_left", mode);
    dump_raw(name, left, 1, 1, de);
    av1_filter_intra_predictor_c(dst, w, TX_8X8, above, left, mode);
    int dd[2] = { h, w };
    snprintf(name, sizeof(name), "fi_m%d_out", mode);
    dump_raw(name, dst, 1, 2, dd);
  }
  fclose(out);
  fprintf(stderr, "golden intra dumped\n");
  return 0;
}
