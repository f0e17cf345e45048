/*
 * dump_golden_convolve.c — golden vectors for the inter-prediction subpel
 * convolve family (av1_convolve_{2d,x,y}_sr_c) across filters and phases.
 * Build: gcc tools/dump_golden_convolve.c -I$REF -I$REFBUILD $REFBUILD/libaom.a -lm
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/filter.h"
#include "av1/common/convolve.h"

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

static uint32_t st = 0x5151;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_convolve.bin", "wb");
  char name[96];
  static const int ws[4] = { 4, 8, 16, 32 };
  static const int hs[4] = { 4, 16, 8, 32 };
  static uint8_t src[96 * 96], dst[64 * 64];
  for (int filt = 0; filt < 4; filt++) {
    for (int si = 0; si < 4; si++) {
      const int w = ws[si], h = hs[si];
      const InterpFilterParams *px =
          av1_get_interp_filter_params_with_block_size((InterpFilter)filt, w);
      const InterpFilterParams *py =
          av1_get_interp_filter_params_with_block_size((InterpFilter)filt, h);
      for (int sx = 0; sx < 16; sx += 5) {
        for (int sy = 0; sy < 16; sy += 7) {
          for (int i = 0; i < 96 * 96; i++) src[i] = lcg() & 255;
          const uint8_t *s = src + 16 * 96 + 16;
          ConvolveParams cp = get_conv_params(0, 0, 8);
          if (sx && sy) {
            av1_convolve_2d_sr_c(s, 96, dst, w, w, h, px, py, sx << 0, sy << 0,
                                 &cp);
          } else if (sx) {
            av1_convolve_x_sr_c(s, 96, dst, w, w, h, px, sx, &cp);
          } else if (sy) {
            av1_convolve_y_sr_c(s, 96, dst, w, w, h, py, sy);
          } else {
            continue;
          }
          int di[2] = { 96, 96 };
          snprintf(name, sizeof(name), "cv_f%d_%dx%d_s%d_%d_src", filt, w, h,
                   sx, sy);
          dump_raw(name, src, 1, 2, di);
          int dd[2] = { h, w };
          snprintf(name, sizeof(name), "cv_f%d_%dx%d_s%d_%d_out", filt, w, h,
                   sx, sy);
          dump_raw(name, dst, 1, 2, dd);
        }
      }
    }
  }
  fclose(out);
  fprintf(stderr, "golden convolve dumped\n");
  return 0;
}
