/*
 * dump_golden_resize.c — golden vectors for the normative superres
 * upscale (upscale_normative_rect / av1_convolve_horiz_rs) and the
 * non-normative av1_resize_plane across scaling ratios.
 * Build: gcc tools/dump_golden_resize.c -I$REF -I$REFBUILD -lm \
 *        $REFBUILD/libaom.a  (resize.c #included for statics)
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "av1/common/resize.c"

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

static uint32_t st = 0xabcd;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_resize.bin", "wb");
  char name[96];

  /* normative superres upscale: upscaled widths x denominators */
  static const int uws[3] = { 128, 176, 352 };
  static const int H = 24;
  static uint8_t buf[64 + 24 * 512 + 64], dst[24 * 512];
  for (int wi = 0; wi < 3; wi++) {
    for (int denom = 9; denom <= 16; denom++) {
      int uw = uws[wi];
      int dw = uw;
      av1_calculate_scaled_superres_size(&dw, &dw, denom);
      /* layout with generous stride + border for the pad writes */
      int stride = 512;
      uint8_t *input = buf + 32;
      for (int i = 0; i < H * stride + 64; i++) buf[i] = lcg() & 255;
      const int32_t x_step_qn = av1_get_upscale_convolve_step(dw, uw);
      const int32_t x0_qn = get_upscale_convolve_x0(dw, uw, x_step_qn);
      int di[2] = { H, dw };
      snprintf(name, sizeof(name), "sr_%d_%d_src", uw, denom);
      {
        static uint8_t tmp[24 * 512];
        for (int i = 0; i < H; i++)
          memcpy(tmp + i * dw, input + i * stride, dw);
        dump_raw(name, tmp, 1, 2, di);
      }
      if (!upscale_normative_rect(input, H, dw, stride, dst, H, uw, uw,
                                  x_step_qn, x0_qn, 1, 1)) {
        fprintf(stderr, "upscale failed\n");
        return 1;
      }
      int doo[2] = { H, uw };
      snprintf(name, sizeof(name), "sr_%d_%d_out", uw, denom);
      dump_raw(name, dst, 1, 2, doo);
    }
  }

  /* non-normative resize: ratios incl exact 1/2 */
  static const int rs[4][4] = {
    { 64, 48, 32, 24 }, { 64, 48, 48, 36 }, { 80, 60, 40, 30 },
    { 96, 64, 72, 48 },
  };
  for (int c = 0; c < 4; c++) {
    int w = rs[c][0], h = rs[c][1], w2 = rs[c][2], h2 = rs[c][3];
    static uint8_t src2[96 * 64], dst2[96 * 64];
    for (int i = 0; i < w * h; i++) src2[i] = lcg() & 255;
    av1_resize_plane(src2, h, w, w, dst2, h2, w2, w2);
    int di[2] = { h, w }, doo[2] = { h2, w2 };
    snprintf(name, sizeof(name), "rz_%dx%d_%dx%d_src", w, h, w2, h2);
    dump_raw(name, src2, 1, 2, di);
    snprintf(name, sizeof(name), "rz_%dx%d_%dx%d_out", w, h, w2, h2);
    dump_raw(name, dst2, 1, 2, doo);
  }
  fclose(out);
  fprintf(stderr, "golden resize dumped\n");
  return 0;
}
