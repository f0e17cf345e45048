/*
 * dump_golden_lpf.c — golden vectors for the deblocking leaf kernels
 * aom_lpf_{horizontal,vertical}_{4,6,8,14}_c across levels/sharpness.
 * Build: gcc tools/dump_golden_lpf.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/aom_dsp_rtcd.h"

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

static uint32_t st = 0x77aa;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

/* thresholds like av1_loop_filter_init + update_sharpness */
static void limits_for(int level, int sharpness, uint8_t *blimit,
                       uint8_t *limit, uint8_t *thresh) {
  int lim = level >> ((sharpness > 0) + (sharpness > 4));
  if (sharpness > 0 && lim > 9 - sharpness) lim = 9 - sharpness;
  if (lim < 1) lim = 1;
  memset(limit, lim, 16);
  memset(blimit, 2 * (level + 2) + lim, 16);
  memset(thresh, level >> 4, 16);
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_lpf.bin", "wb");
  char name[96];
  static const int levels[6] = { 1, 7, 15, 23, 31, 63 };
  static const int sharps[3] = { 0, 2, 5 };
  static uint8_t buf[32 * 32];
  uint8_t blimit[16], limit[16], thresh[16];

  for (int li = 0; li < 6; li++) {
    for (int si = 0; si < 3; si++) {
      limits_for(levels[li], sharps[si], blimit, limit, thresh);
      for (int len_i = 0; len_i < 4; len_i++) {
        static const int lens[4] = { 4, 6, 8, 14 };
        const int len = lens[len_i];
        for (int rep = 0; rep < 6; rep++) {
          /* smooth-ish content so masks trigger sometimes: small steps */
          int base = lcg() & 255;
          for (int i = 0; i < 32 * 32; i++) {
            base += (int)(lcg() % 7) - 3;
            if (base < 0) base = 0;
            if (base > 255) base = 255;
            buf[i] = base;
          }
          int di[2] = { 32, 32 };
          snprintf(name, sizeof(name), "lpf_h%d_l%d_s%d_r%d_in", len,
                   levels[li], sharps[si], rep);
          dump_raw(name, buf, 1, 2, di);
          /* horizontal edge at row 16, 4 cols starting col 8 */
          uint8_t *p = buf + 16 * 32 + 8;
          switch (len) {
            case 4: aom_lpf_horizontal_4_c(p, 32, blimit, limit, thresh); break;
            case 6: aom_lpf_horizontal_6_c(p, 32, blimit, limit, thresh); break;
            case 8: aom_lpf_horizontal_8_c(p, 32, blimit, limit, thresh); break;
            case 14:
              aom_lpf_horizontal_14_c(p, 32, blimit, limit, thresh);
              break;
          }
          snprintf(name, sizeof(name), "lpf_h%d_l%d_s%d_r%d_out", len,
                   levels[li], sharps[si], rep);
          dump_raw(name, buf, 1, 2, di);
          /* vertical edge at col 16, 4 rows starting row 8 */
          snprintf(name, sizeof(name), "lpf_v%d_l%d_s%d_r%d_in", len,
                   levels[li], sharps[si], rep);
          dump_raw(name, buf, 1, 2, di);
          p = buf + 8 * 32 + 16;
          switch (len) {
            case 4: aom_lpf_vertical_4_c(p, 32, blimit, limit, thresh); break;
            case 6: aom_lpf_vertical_6_c(p, 32, blimit, limit, thresh); break;
            case 8: aom_lpf_vertical_8_c(p, 32, blimit, limit, thresh); break;
            case 14: aom_lpf_vertical_14_c(p, 32, blimit, limit, thresh); break;
          }
          snprintf(name, sizeof(name), "lpf_v%d_l%d_s%d_r%d_out", len,
                   levels[li], sharps[si], rep);
          dump_raw(name, buf, 1, 2, di);
        }
      }
    }
  }
  fclose(out);
  fprintf(stderr, "golden lpf dumped\n");
  return 0;
}
