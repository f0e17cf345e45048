/*
 * dump_golden_metrics2.c — golden vectors for sub_pixel_variance,
 * sub_pixel_avg_variance, obmc_sad/variance, masked_sad.
 * Build: gcc tools/dump_golden_metrics2.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
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

static uint32_t st = 0x7531;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_metrics2.bin", "wb");
  char name[96];
  static uint8_t src[40 * 40], ref[32 * 32], sec[32 * 32], m8[32 * 32];
  static int32_t wsrc[32 * 32], mask32[32 * 32];
  for (int c = 0; c < 8; c++) {
    const int xo = c % 8, yo = (c * 3) % 8;
    for (int i = 0; i < 40 * 40; i++) src[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) ref[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) sec[i] = lcg() & 255;
    uint32_t sse;
    uint32_t var = aom_sub_pixel_variance16x16_c(src, 40, xo, yo, ref, 16,
                                                 &sse);
    uint32_t sse2;
    uint32_t var2 = aom_sub_pixel_avg_variance16x16_c(src, 40, xo, yo, ref,
                                                      16, &sse2, sec);
    int ds[2] = { 40, 40 }, dr[2] = { 16, 16 };
    snprintf(name, sizeof(name), "sp%d_src", c);
    dump_raw(name, src, 1, 2, ds);
    snprintf(name, sizeof(name), "sp%d_ref", c);
    dump_raw(name, ref, 1, 2, dr);
    snprintf(name, sizeof(name), "sp%d_sec", c);
    dump_raw(name, sec, 1, 2, dr);
    int32_t misc[6] = { xo, yo, (int32_t)var, (int32_t)sse, (int32_t)var2,
                        (int32_t)sse2 };
    int dm[1] = { 6 };
    snprintf(name, sizeof(name), "sp%d_misc", c);
    dump_raw(name, misc, 4, 1, dm);
  }
  for (int c = 0; c < 6; c++) {
    for (int i = 0; i < 32 * 32; i++) ref[i] = lcg() & 255;
    for (int i = 0; i < 16 * 16; i++) wsrc[i] = (int32_t)(lcg() % (1 << 20));
    for (int i = 0; i < 16 * 16; i++) mask32[i] = (int32_t)(lcg() % 4097);
    unsigned int s = aom_obmc_sad16x16_c(ref, 16, wsrc, mask32);
    unsigned int sse;
    unsigned int var = aom_obmc_variance16x16_c(ref, 16, wsrc, mask32, &sse);
    int dr[2] = { 16, 16 };
    snprintf(name, sizeof(name), "ob%d_pre", c);
    dump_raw(name, ref, 1, 2, dr);
    snprintf(name, sizeof(name), "ob%d_wsrc", c);
    dump_raw(name, wsrc, 4, 2, dr);
    snprintf(name, sizeof(name), "ob%d_mask", c);
    dump_raw(name, mask32, 4, 2, dr);
    int32_t misc[3] = { (int32_t)s, (int32_t)var, (int32_t)sse };
    int dm[1] = { 3 };
    snprintf(name, sizeof(name), "ob%d_misc", c);
    dump_raw(name, misc, 4, 1, dm);
  }
  for (int c = 0; c < 4; c++) {
    for (int i = 0; i < 32 * 32; i++) src[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) ref[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) sec[i] = lcg() & 255;
    for (int i = 0; i < 32 * 32; i++) m8[i] = lcg() % 65;
    unsigned int s =
        aom_masked_sad16x16_c(src, 32, ref, 16, sec, m8, 16, c & 1);
    int ds[2] = { 32, 32 }, dr[2] = { 16, 16 };
    snprintf(name, sizeof(name), "mk%d_src", c);
    dump_raw(name, src, 1, 2, ds);
    snprintf(name, sizeof(name), "mk%d_ref", c);
    dump_raw(name, ref, 1, 2, dr);
    snprintf(name, sizeof(name), "mk%d_sec", c);
    dump_raw(name, sec, 1, 2, dr);
    snprintf(name, sizeof(name), "mk%d_mask", c);
    dump_raw(name, m8, 1, 2, dr);
    int32_t misc[2] = { (int32_t)s, c & 1 };
    int dm[1] = { 2 };
    snprintf(name, sizeof(name), "mk%d_misc", c);
    dump_raw(name, misc, 4, 1, dm);
  }
  fclose(out);
  fprintf(stderr, "golden metrics2 dumped\n");
  return 0;
}
