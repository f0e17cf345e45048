/*
 * dump_golden_tf.c — golden vectors for av1_apply_temporal_filter_c
 * (the ARF/KF temporal filter weighting kernel).
 * Build: gcc tools/dump_golden_tf.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/encoder/encoder.h"
#include "av1/encoder/temporal_filter.h"
#include "av1/common/blockd.h"
#include "aom_scale/yv12config.h"

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

static uint32_t st = 0x1111;
static uint32_t lcg(void) {
  st = st * 1103515245u + 12345u;
  return st >> 16;
}

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_tf.bin", "wb");
  char name[96];
  enum { MB = 32, FW = 128, FH = 96 };
  static uint8_t ybuf[FH * FW], ubuf[(FH / 2) * (FW / 2)],
      vbuf[(FH / 2) * (FW / 2)];
  static uint8_t pred[MB * MB + 2 * (MB / 2) * (MB / 2)];
  static uint32_t accum[MB * MB + 2 * (MB / 2) * (MB / 2)];
  static uint16_t count[MB * MB + 2 * (MB / 2) * (MB / 2)];

  YV12_BUFFER_CONFIG f;
  memset(&f, 0, sizeof(f));
  f.y_crop_width = FW;
  f.y_crop_height = FH;
  f.buffers[0] = ybuf;
  f.buffers[1] = ubuf;
  f.buffers[2] = vbuf;
  f.strides[0] = FW;
  f.strides[1] = FW / 2;
  f.flags = 0;

  MACROBLOCKD mbd;
  memset(&mbd, 0, sizeof(mbd));
  mbd.bd = 8;
  mbd.plane[0].subsampling_x = mbd.plane[0].subsampling_y = 0;
  mbd.plane[1].subsampling_x = mbd.plane[1].subsampling_y = 1;
  mbd.plane[2].subsampling_x = mbd.plane[2].subsampling_y = 1;

  static const int qs[4] = { 30, 80, 150, 230 };
  static const int strengths[4] = { 2, 5, 2, 4 };
  for (int c = 0; c < 4; c++) {
    for (int i = 0; i < FH * FW; i++) ybuf[i] = lcg() & 255;
    for (int i = 0; i < (FH / 2) * (FW / 2); i++) ubuf[i] = lcg() & 255;
    for (int i = 0; i < (FH / 2) * (FW / 2); i++) vbuf[i] = lcg() & 255;
    for (size_t i = 0; i < sizeof(pred); i++)
      pred[i] = (ybuf[i % (FH * FW)] + (int)(lcg() % 21) - 10) & 255;
    memset(accum, 0, sizeof(accum));
    memset(count, 0, sizeof(count));
    double noise[3] = { 0.5 + (c * 0.7), 1.1, 2.3 };
    MV mvs[4];
    int mses[4];
    for (int s = 0; s < 4; s++) {
      mvs[s].row = (int16_t)((int)(lcg() % 65) - 32);
      mvs[s].col = (int16_t)((int)(lcg() % 65) - 32);
      mses[s] = (int)(lcg() % 2000);
    }
    const int mb_row = 1, mb_col = 2;
    av1_apply_temporal_filter_c(&f, &mbd, BLOCK_32X32, mb_row, mb_col, 3,
                                noise, mvs, mses, qs[c], strengths[c], pred,
                                accum, count);
    int d1[2] = { FH, FW }, d2[2] = { FH / 2, FW / 2 };
    snprintf(name, sizeof(name), "tf%d_y", c);
    dump_raw(name, ybuf, 1, 2, d1);
    snprintf(name, sizeof(name), "tf%d_u", c);
    dump_raw(name, ubuf, 1, 2, d2);
    snprintf(name, sizeof(name), "tf%d_v", c);
    dump_raw(name, vbuf, 1, 2, d2);
    int dp[1] = { (int)sizeof(pred) };
    snprintf(name, sizeof(name), "tf%d_pred", c);
    dump_raw(name, pred, 1, 1, dp);
    int dmv[2] = { 4, 2 };
    int32_t mvs32[8];
    for (int s = 0; s < 4; s++) { mvs32[2 * s] = mvs[s].row; mvs32[2 * s + 1] = mvs[s].col; }
    snprintf(name, sizeof(name), "tf%d_mvs", c);
    dump_raw(name, mvs32, 4, 2, dmv);
    int dms[1] = { 4 };
    snprintf(name, sizeof(name), "tf%d_mses", c);
    dump_raw(name, mses, 4, 1, dms);
    int32_t misc[4] = { qs[c], strengths[c], mb_row, mb_col };
    snprintf(name, sizeof(name), "tf%d_misc", c);
    dump_raw(name, misc, 4, 1, dms);
    double nz[3] = { noise[0], noise[1], noise[2] };
    int dn[1] = { 3 };
    snprintf(name, sizeof(name), "tf%d_noise", c);
    dump_raw(name, nz, 8, 1, dn);
    int da[1] = { (int)(sizeof(accum) / 4) };
    snprintf(name, sizeof(name), "tf%d_accum", c);
    dump_raw(name, accum, 4, 1, da);
    snprintf(name, sizeof(name), "tf%d_count", c);
    dump_raw(name, count, 2, 1, da);
  }
  fclose(out);
  fprintf(stderr, "golden tf dumped\n");
  return 0;
}
