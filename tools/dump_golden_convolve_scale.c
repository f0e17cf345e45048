/*
 * dump_golden_convolve_scale.c — golden vectors for the scaled-reference
 * convolve (av1_convolve_2d_scale_c, av1/common/convolve.c:371) across
 * filters, block sizes, scale steps and phases (single-ref path).
 * Build: gcc tools/dump_golden_convolve_scale.c -I$REF -I$REFBUILD \
 *        $REFBUILD/libaom.a -lm -lpthread
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

static uint32_t st = 0xC0DE;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

#define SRC_DIM 160

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_convolve_scale.bin", "wb");
  char name[128];
  static const int ws[3] = { 8, 16, 32 };
  static const int hs[3] = { 16, 8, 32 };
  /* x/y step in 1/1024 units: 1:1, 3/2 downscale, 2:1 downscale, and a
   * non-dyadic 1638 (~8/5) like real resize denominators produce */
  static const int steps[4] = { 1024, 1536, 2048, 1638 };
  static uint8_t src[SRC_DIM * SRC_DIM], dst[64 * 64];
  for (int filt = 0; filt < 2; filt++) {
    for (int si = 0; si < 3; si++) {
      const int w = ws[si], h = hs[si];
      const InterpFilterParams *px =
          av1_get_interp_filter_params_with_block_size((InterpFilter)filt, w);
      const InterpFilterParams *py =
          av1_get_interp_filter_params_with_block_size((InterpFilter)filt, h);
      for (int sti = 0; sti < 4; sti++) {
        const int xs = steps[sti], ys = steps[(sti + 1) & 3];
        for (int ph = 0; ph < 2; ph++) {
          const int spx = ph ? 517 : 64, spy = ph ? 260 : 960;
          for (int i = 0; i < SRC_DIM * SRC_DIM; i++) src[i] = lcg() & 255;
          const uint8_t *s = src + 32 * SRC_DIM + 32;
          ConvolveParams cp = get_conv_params(0, 0, 8);
          av1_convolve_2d_scale_c(s, SRC_DIM, dst, w, w, h, px, py, spx, xs,
                                  spy, ys, &cp);
          int di[2] = { SRC_DIM, SRC_DIM };
          snprintf(name, sizeof(name), "cvs_f%d_%dx%d_st%d_%d_p%d_src", filt,
                   w, h, xs, ys, ph);
          dump_raw(name, src, 1, 2, di);
          int dd[2] = { h, w };
          snprintf(name, sizeof(name), "cvs_f%d_%dx%d_st%d_%d_p%d_out", filt,
                   w, h, xs, ys, ph);
          dump_raw(name, dst, 1, 2, dd);
        }
      }
    }
  }
  fclose(out);
  fprintf(stderr, "golden convolve_scale dumped\n");
  return 0;
}
