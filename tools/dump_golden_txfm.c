/*
 * dump_golden_txfm.c — golden test vectors for transforms: random blocks
 * through the reference av1_fwd_txfm2d_*_c / av1_inv_txfm2d_add_*_c (plus
 * lossless WHT), dumped in the record format of tools/dump_tables.c.
 * Build: gcc tools/dump_golden_txfm.c -I$REF -I$REFBUILD $REFBUILD/libaom.a -lm
 */
#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/av1_txfm.h"
#include "av1/common/enums.h"
#include "aom_dsp/aom_dsp_common.h"

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

static uint32_t state = 0xdeadbeef;
static uint32_t lcg(void) {
  state = state * 1103515245u + 12345u;
  return state >> 16;
}

typedef void (*Fwd)(const int16_t *, int32_t *, int, TX_TYPE, int);
typedef void (*Inv)(const int32_t *, uint16_t *, int, TX_TYPE, int);

static const Fwd fwd_fn[TX_SIZES_ALL] = {
  av1_fwd_txfm2d_4x4_c,   av1_fwd_txfm2d_8x8_c,   av1_fwd_txfm2d_16x16_c,
  av1_fwd_txfm2d_32x32_c, av1_fwd_txfm2d_64x64_c, av1_fwd_txfm2d_4x8_c,
  av1_fwd_txfm2d_8x4_c,   av1_fwd_txfm2d_8x16_c,  av1_fwd_txfm2d_16x8_c,
  av1_fwd_txfm2d_16x32_c, av1_fwd_txfm2d_32x16_c, av1_fwd_txfm2d_32x64_c,
  av1_fwd_txfm2d_64x32_c, av1_fwd_txfm2d_4x16_c,  av1_fwd_txfm2d_16x4_c,
  av1_fwd_txfm2d_8x32_c,  av1_fwd_txfm2d_32x8_c,  av1_fwd_txfm2d_16x64_c,
  av1_fwd_txfm2d_64x16_c,
};
static const Inv inv_fn[TX_SIZES_ALL] = {
  av1_inv_txfm2d_add_4x4_c,   av1_inv_txfm2d_add_8x8_c,
  av1_inv_txfm2d_add_16x16_c, av1_inv_txfm2d_add_32x32_c,
  av1_inv_txfm2d_add_64x64_c, av1_inv_txfm2d_add_4x8_c,
  av1_inv_txfm2d_add_8x4_c,   av1_inv_txfm2d_add_8x16_c,
  av1_inv_txfm2d_add_16x8_c,  av1_inv_txfm2d_add_16x32_c,
  av1_inv_txfm2d_add_32x16_c, av1_inv_txfm2d_add_32x64_c,
  av1_inv_txfm2d_add_64x32_c, av1_inv_txfm2d_add_4x16_c,
  av1_inv_txfm2d_add_16x4_c,  av1_inv_txfm2d_add_8x32_c,
  av1_inv_txfm2d_add_32x8_c,  av1_inv_txfm2d_add_16x64_c,
  av1_inv_txfm2d_add_64x16_c,
};

static int dim_ok(int n, int t1d) {
  /* t1d: 0 DCT, 1 ADST, 2 FLIPADST, 3 IDTX (av1_txfm_type_ls validity) */
  if (n <= 16) return 1;
  if (n == 32) return t1d == 0 || t1d == 3;
  return t1d == 0; /* 64 */
}
static const int vtx[16] = { 0, 1, 0, 1, 2, 0, 2, 1, 2, 3, 0, 3, 1, 3, 2, 3 };
static const int htx[16] = { 0, 0, 1, 1, 0, 2, 2, 2, 1, 3, 3, 0, 3, 1, 3, 2 };

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "golden_txfm.bin", "wb");
  const int B = 4; /* blocks per (size,type) */
  char name[96];
  for (int ts = 0; ts < TX_SIZES_ALL; ts++) {
    const int w = tx_size_wide[ts], h = tx_size_high[ts];
    for (int tt = 0; tt < TX_TYPES; tt++) {
      if (!dim_ok(h, vtx[tt]) || !dim_ok(w, htx[tt])) continue;
      static int16_t input[64 * 64 * 8];
      static int32_t coeff[64 * 64 * 8];
      static int32_t icoeff[64 * 64 * 8];
      static uint16_t pred[64 * 64 * 8];
      static uint16_t recon[64 * 64 * 8];
      for (int bi = 0; bi < B; bi++) {
        int16_t *in = input + bi * w * h;
        for (int i = 0; i < w * h; i++) in[i] = (int)(lcg() % 511) - 255;
        fwd_fn[ts](in, coeff + bi * w * h, w /*stride*/, (TX_TYPE)tt, 8);
        /* 64-dim inverse transforms take a compacted <=32 coefficient
           buffer (av1_inv_txfm2d.c:348+ remaps + zero-extends). Dump the
           full zero-extended array; feed C the compact one. */
        const int cw = w > 32 ? 32 : w, ch = h > 32 ? 32 : h;
        int32_t *ic = icoeff + bi * w * h;
        static int32_t compact[64 * 64];
        memset(ic, 0, w * h * sizeof(*ic));
        for (int c = 0; c < cw; c++)
          for (int r = 0; r < ch; r++) {
            int v = (int)(lcg() % 8191) - 4095;
            ic[c * h + r] = v;
            compact[c * ch + r] = v;
          }
        uint16_t *pr = pred + bi * w * h, *rc = recon + bi * w * h;
        for (int i = 0; i < w * h; i++) pr[i] = rc[i] = lcg() & 255;
        inv_fn[ts](compact, rc, w /*stride*/, (TX_TYPE)tt, 8);
      }
      int dims3[3] = { B, 0, 0 };
      dims3[1] = h; dims3[2] = w;
      snprintf(name, sizeof(name), "fwd_in_ts%d_tt%d", ts, tt);
      dump_raw(name, input, 2, 3, dims3);
      snprintf(name, sizeof(name), "inv_pred_ts%d_tt%d", ts, tt);
      dump_raw(name, pred, 2, 3, dims3);
      snprintf(name, sizeof(name), "inv_recon_ts%d_tt%d", ts, tt);
      dump_raw(name, recon, 2, 3, dims3);
      int dimsc[3] = { B, 0, 0 };
      dimsc[1] = w; dimsc[2] = h; /* C coeff layout: flat c*H+r */
      snprintf(name, sizeof(name), "fwd_out_ts%d_tt%d", ts, tt);
      dump_raw(name, coeff, 4, 3, dimsc);
      snprintf(name, sizeof(name), "inv_in_ts%d_tt%d", ts, tt);
      dump_raw(name, icoeff, 4, 3, dimsc);
    }
  }

  /* lossless WHT: av1_fwht4x4_c + av1_highbd_iwht4x4_16_add_c */
  {
    const int B = 8;
    static int16_t in[16 * 8];
    static int32_t co[16 * 8];
    static int32_t ic[16 * 8];
    static uint16_t pr[16 * 8], rc[16 * 8];
    for (int bi = 0; bi < B; bi++) {
      for (int i = 0; i < 16; i++) in[bi * 16 + i] = (int)(lcg() % 511) - 255;
      av1_fwht4x4_c(in + bi * 16, co + bi * 16, 4);
      for (int i = 0; i < 16; i++) ic[bi * 16 + i] = (int)(lcg() % 2047) - 1023;
      for (int i = 0; i < 16; i++) pr[bi * 16 + i] = rc[bi * 16 + i] = lcg() & 255;
      av1_highbd_iwht4x4_16_add_c(ic + bi * 16, CONVERT_TO_BYTEPTR(rc + bi * 16), 4, 8);
    }
    int d3[3] = { B, 4, 4 };
    dump_raw("wht_in", in, 2, 3, d3);
    dump_raw("wht_out", co, 4, 3, d3);
    dump_raw("iwht_in", ic, 4, 3, d3);
    dump_raw("iwht_pred", pr, 2, 3, d3);
    dump_raw("iwht_recon", rc, 2, 3, d3);
  }
  fclose(out);
  fprintf(stderr, "golden txfm dumped\n");
  return 0;
}
