/*
 * dump_golden_grain.c — golden vectors for film grain synthesis
 * (av1_add_film_grain_run) across the encoder's film_grain_test_vectors,
 * plus the normative gaussian_sequence table.
 *
 * Build: gcc tools/dump_golden_grain.c -I$REF -I$REFBUILD -lm \
 *        $REFBUILD/libaom.a
 * (grain_synthesis.c is #included so its statics are visible; its symbols
 *  shadow the libaom.a copies, which are then never pulled in.)
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "av1/decoder/grain_synthesis.c"
#include "av1/encoder/grain_test_vectors.h"

static FILE *out;
static void dump_raw(const char *name, const void *data, int es, int nd,
                     const int *dims) {
  uint32_t nl = (uint32_t)strlen(name), e = es, n = nd;
  size_t total = 1;
  fwrite(&nl, 4, 1, out);
  fwrite(name, 1, nl, out);
  fwrite(&e, 4, 1, out);
  fwrite(&n, 4, 1, out);
  for (int i = 0; i < nd; i++) {
    uint32_t d = dims[i];
    fwrite(&d, 4, 1, out);
    total *= dims[i];
  }
  fwrite(data, es, total, out);
}

static void dump_i(const char *name, int v) {
  int d[1] = { 1 };
  dump_raw(name, &v, 4, 1, d);
}

static uint32_t st = 0x9e37;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_grain.bin", "wb");
  char name[96];

  {
    int d[1] = { 2048 };
    dump_raw("gaussian_sequence", gaussian_sequence, 4, 1, d);
  }

  static const int ws[3] = { 96, 82, 64 };
  static const int hs[3] = { 64, 46, 64 };
  static uint8_t luma[96 * 64], cb[48 * 32], cr[48 * 32];

  for (int v = 0; v < 16; v++) {
    aom_film_grain_t p = film_grain_test_vectors[v];
    p.bit_depth = 8;
    const int w = ws[v % 3], h = hs[v % 3];
    const int cw = w >> 1, ch = h >> 1;
    for (int i = 0; i < w * h; i++) luma[i] = lcg() & 255;
    for (int i = 0; i < cw * ch; i++) cb[i] = lcg() & 255;
    for (int i = 0; i < cw * ch; i++) cr[i] = lcg() & 255;

    int dl[2] = { h, w }, dc[2] = { ch, cw };
    snprintf(name, sizeof(name), "g%d_luma_in", v);
    dump_raw(name, luma, 1, 2, dl);
    snprintf(name, sizeof(name), "g%d_cb_in", v);
    dump_raw(name, cb, 1, 2, dc);
    snprintf(name, sizeof(name), "g%d_cr_in", v);
    dump_raw(name, cr, 1, 2, dc);

    /* params (the fields the python side needs) */
    snprintf(name, sizeof(name), "g%d_sp_y", v);
    int d14[2] = { 14, 2 };
    dump_raw(name, p.scaling_points_y, 4, 2, d14);
    snprintf(name, sizeof(name), "g%d_sp_cb", v);
    int d10[2] = { 10, 2 };
    dump_raw(name, p.scaling_points_cb, 4, 2, d10);
    snprintf(name, sizeof(name), "g%d_sp_cr", v);
    dump_raw(name, p.scaling_points_cr, 4, 2, d10);
    snprintf(name, sizeof(name), "g%d_ar_y", v);
    int d24[1] = { 24 };
    dump_raw(name, p.ar_coeffs_y, 4, 1, d24);
    snprintf(name, sizeof(name), "g%d_ar_cb", v);
    int d25[1] = { 25 };
    dump_raw(name, p.ar_coeffs_cb, 4, 1, d25);
    snprintf(name, sizeof(name), "g%d_ar_cr", v);
    dump_raw(name, p.ar_coeffs_cr, 4, 1, d25);
#define DI(field)                            \
  snprintf(name, sizeof(name), "g%d_" #field, v); \
  dump_i(name, p.field)
    DI(num_y_points);
    DI(num_cb_points);
    DI(num_cr_points);
    DI(scaling_shift);
    DI(ar_coeff_lag);
    DI(ar_coeff_shift);
    DI(cb_mult);
    DI(cb_luma_mult);
    DI(cb_offset);
    DI(cr_mult);
    DI(cr_luma_mult);
    DI(cr_offset);
    DI(overlap_flag);
    DI(clip_to_restricted_range);
    DI(chroma_scaling_from_luma);
    DI(grain_scale_shift);
    DI(random_seed);
#undef DI

    if (av1_add_film_grain_run(&p, luma, cb, cr, h, w, w, cw, 0, 1, 1, 0)) {
      fprintf(stderr, "grain run failed v=%d\n", v);
      return 1;
    }
    snprintf(name, sizeof(name), "g%d_luma_out", v);
    dump_raw(name, luma, 1, 2, dl);
    snprintf(name, sizeof(name), "g%d_cb_out", v);
    dump_raw(name, cb, 1, 2, dc);
    snprintf(name, sizeof(name), "g%d_cr_out", v);
    dump_raw(name, cr, 1, 2, dc);
  }
  fclose(out);
  fprintf(stderr, "golden grain dumped\n");
  return 0;
}
