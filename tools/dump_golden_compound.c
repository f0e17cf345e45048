/*
 * dump_golden_compound.c — golden vectors for the compound prediction
 * kernels: av1_dist_wtd_convolve_{2d,x,y,2d_copy}_c two-ref flow,
 * aom_blend_a64_{mask,hmask,vmask}_c, av1_build_compound_diffwtd_mask_c.
 * Build: gcc tools/dump_golden_compound.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "config/aom_dsp_rtcd.h"
#include "av1/common/filter.h"
#include "av1/common/convolve.h"
#include "av1/common/reconinter.h"
#include "aom_dsp/blend.h"

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

static uint32_t st = 0x3690;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_compound.bin", "wb");
  char name[96];
  static uint8_t src0[64 * 64], src1[64 * 64], dst[32 * 32];
  static uint16_t convbuf[32 * 32];
  int count = 0;
  /* dist-wtd two-ref flow across phases and weights */
  static const int quant_dist_lookup[4][2] = {
    { 9, 7 }, { 11, 5 }, { 12, 4 }, { 13, 3 }
  };
  for (int phase = 0; phase < 4; phase++) {
    for (int wsel = 0; wsel < 4; wsel++) {
      const int w = 16, h = 16;
      const int sx = (phase & 1) ? (3 + wsel) : 0;
      const int sy = (phase & 2) ? (9 + wsel) : 0;
      for (int i = 0; i < 64 * 64; i++) src0[i] = lcg() & 255;
      for (int i = 0; i < 64 * 64; i++) src1[i] = lcg() & 255;
      const InterpFilterParams *fp =
          av1_get_interp_filter_params_with_block_size(EIGHTTAP_REGULAR, 16);
      ConvolveParams cp = get_conv_params_no_round(0, 0, convbuf, 32, 1, 8);
      cp.use_dist_wtd_comp_avg = (wsel != 0);
      cp.fwd_offset = quant_dist_lookup[wsel][0];
      cp.bck_offset = quant_dist_lookup[wsel][1];
      const uint8_t *s0 = src0 + 16 * 64 + 16;
      const uint8_t *s1 = src1 + 16 * 64 + 16;
      cp.do_average = 0;
      if (sx && sy)
        av1_dist_wtd_convolve_2d_c(s0, 64, dst, 16, w, h, fp, fp, sx, sy, &cp);
      else if (sx)
        av1_dist_wtd_convolve_x_c(s0, 64, dst, 16, w, h, fp, sx, &cp);
      else if (sy)
        av1_dist_wtd_convolve_y_c(s0, 64, dst, 16, w, h, fp, sy, &cp);
      else
        av1_dist_wtd_convolve_2d_copy_c(s0, 64, dst, 16, w, h, &cp);
      cp.do_average = 1;
      if (sx && sy)
        av1_dist_wtd_convolve_2d_c(s1, 64, dst, 16, w, h, fp, fp, sx, sy, &cp);
      else if (sx)
        av1_dist_wtd_convolve_x_c(s1, 64, dst, 16, w, h, fp, sx, &cp);
      else if (sy)
        av1_dist_wtd_convolve_y_c(s1, 64, dst, 16, w, h, fp, sy, &cp);
      else
        av1_dist_wtd_convolve_2d_copy_c(s1, 64, dst, 16, w, h, &cp);

      int ds[2] = { 64, 64 }, dd[2] = { h, w };
      snprintf(name, sizeof(name), "cp%d_src0", count);
      dump_raw(name, src0, 1, 2, ds);
      snprintf(name, sizeof(name), "cp%d_src1", count);
      dump_raw(name, src1, 1, 2, ds);
      int32_t misc[6] = { sx, sy, cp.use_dist_wtd_comp_avg,
                          cp.fwd_offset, cp.bck_offset, 16 };
      int dm[1] = { 6 };
      snprintf(name, sizeof(name), "cp%d_misc", count);
      dump_raw(name, misc, 4, 1, dm);
      snprintf(name, sizeof(name), "cp%d_out", count);
      dump_raw(name, dst, 1, 2, dd);
      count++;
    }
  }
  /* blends */
  static uint8_t a[32 * 32], b[32 * 32], mask[64 * 64], bl[32 * 32];
  for (int c = 0; c < 4; c++) {
    const int w = 16, h = 16;
    const int subw = c & 1, subh = (c >> 1) & 1;
    for (int i = 0; i < 32 * 32; i++) a[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) b[i] = lcg() & 255;
    for (int i = 0; i < 64 * 64; i++) mask[i] = lcg() % 65;
    aom_blend_a64_mask_c(bl, w, a, 32, b, 32, mask, 2 * w, w, h, subw, subh);
    int da[2] = { 32, 32 }, dmk[2] = { 2 * h, 2 * w }, dd[2] = { h, w };
    snprintf(name, sizeof(name), "bl%d_a", c);
    dump_raw(name, a, 1, 2, da);
    snprintf(name, sizeof(name), "bl%d_b", c);
    dump_raw(name, b, 1, 2, da);
    snprintf(name, sizeof(name), "bl%d_mask", c);
    dump_raw(name, mask, 1, 2, dmk);
    int32_t misc[2] = { subw, subh };
    int dm[1] = { 2 };
    snprintf(name, sizeof(name), "bl%d_misc", c);
    dump_raw(name, misc, 4, 1, dm);
    snprintf(name, sizeof(name), "bl%d_out", c);
    dump_raw(name, bl, 1, 2, dd);
  }
  /* diffwtd masks */
  for (int c = 0; c < 2; c++) {
    const int w = 16, h = 8;
    for (int i = 0; i < 32 * 32; i++) a[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) b[i] = lcg() & 255;
    static uint8_t m[16 * 8];
    av1_build_compound_diffwtd_mask_c(m, c ? DIFFWTD_38_INV : DIFFWTD_38, a,
                                      32, b, 32, h, w);
    int da[2] = { 32, 32 }, dd[2] = { h, w };
    snprintf(name, sizeof(name), "dw%d_a", c);
    dump_raw(name, a, 1, 2, da);
    snprintf(name, sizeof(name), "dw%d_b", c);
    dump_raw(name, b, 1, 2, da);
    snprintf(name, sizeof(name), "dw%d_out", c);
    dump_raw(name, m, 1, 2, dd);
  }
  fclose(out);
  fprintf(stderr, "golden compound dumped (%d conv cases)\n", count);
  return 0;
}
