/*
 * dump_golden_warp.c — golden vectors for av1_warp_affine_c across
 * random valid affine models (luma + subsampled chroma).
 * Build: gcc tools/dump_golden_warp.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/warped_motion.h"
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

static uint32_t st = 0x2468;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}
static int32_t rnd_range(int lo, int hi) {
  return lo + (int)(lcg() % (uint32_t)(hi - lo + 1));
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_warp.bin", "wb");
  char name[96];
  enum { W = 96, H = 80 };
  static uint8_t ref[H * W], pred[64 * 64];
  int count = 0;
  for (int trial = 0; count < 24 && trial < 2000; trial++) {
    WarpedMotionParams wm = default_warp_params;
    wm.wmmat[0] = rnd_range(-(8 << 16), 8 << 16);
    wm.wmmat[1] = rnd_range(-(8 << 16), 8 << 16);
    wm.wmmat[2] = (1 << 16) + rnd_range(-4000, 4000);
    wm.wmmat[3] = rnd_range(-3000, 3000);
    wm.wmmat[4] = rnd_range(-3000, 3000);
    wm.wmmat[5] = (1 << 16) + rnd_range(-4000, 4000);
    wm.wmtype = AFFINE;
    if (!av1_get_shear_params(&wm)) continue;
    for (int i = 0; i < H * W; i++) ref[i] = lcg() & 255;
    const int ss = count & 1; /* alternate luma / chroma subsampling */
    const int pw = ss ? 16 : 32, ph = ss ? 16 : 24;
    const int p_col = 8 + (int)(lcg() % 16), p_row = 8 + (int)(lcg() % 16);
    ConvolveParams cp = get_conv_params(0, 0, 8);
    av1_warp_affine_c(wm.wmmat, ref, W, H, W, pred, p_col, p_row, pw, ph, pw,
                      ss, ss, &cp, wm.alpha, wm.beta, wm.gamma, wm.delta);
    int dm[1] = { 6 };
    snprintf(name, sizeof(name), "w%d_mat", count);
    dump_raw(name, wm.wmmat, 4, 1, dm);
    int32_t misc[8] = { wm.alpha, wm.beta,  wm.gamma, wm.delta,
                        p_col,    p_row,    ss,       cp.round_0 };
    int dmi[1] = { 8 };
    snprintf(name, sizeof(name), "w%d_misc", count);
    dump_raw(name, misc, 4, 1, dmi);
    int dr[2] = { H, W };
    snprintf(name, sizeof(name), "w%d_ref", count);
    dump_raw(name, ref, 1, 2, dr);
    int dp[2] = { ph, pw };
    snprintf(name, sizeof(name), "w%d_out", count);
    dump_raw(name, pred, 1, 2, dp);
    count++;
  }
  fclose(out);
  fprintf(stderr, "golden warp dumped: %d cases\n", count);
  return 0;
}
