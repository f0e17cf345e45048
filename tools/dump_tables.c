/*
 * dump_tables.c — extract normative AV1 tables from the reference build.
 *
 * Build (out-of-repo oracle, see tools/gen_tables.py):
 *   gcc tools/dump_tables.c -I$REF -I$REFBUILD $REFBUILD/libaom.a -lm -o dump_tables
 *
 * Emits a flat record stream:
 *   [u32 name_len][name][u32 elem_size][u32 ndim][u32 dims...][raw data]
 * converted to .npz by tools/gen_tables.py. Only normative *data* (spec
 * constants) is extracted — no code.
 */
#include <stdarg.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "av1/common/entropymode.h"
#include "av1/common/entropymv.h"
#include "av1/common/quant_common.h"
#include "av1/common/scan.h"
#include "av1/common/seg_common.h"
#include "av1/common/token_cdfs.h"
#include "av1/common/av1_txfm.h"
#include "av1/common/blockd.h"

static FILE *out;

static void dump_raw(const char *name, const void *data, int elem_size,
                     int ndim, const int *dims) {
  uint32_t nl = (uint32_t)strlen(name);
  uint32_t es = (uint32_t)elem_size, nd = (uint32_t)ndim;
  size_t total = 1;
  fwrite(&nl, 4, 1, out);
  fwrite(name, 1, nl, out);
  fwrite(&es, 4, 1, out);
  fwrite(&nd, 4, 1, out);
  for (int i = 0; i < ndim; i++) {
    uint32_t d = (uint32_t)dims[i];
    fwrite(&d, 4, 1, out);
    total *= dims[i];
  }
  fwrite(data, elem_size, total, out);
}

/* variadic helper: d16("name", ptr, ndim, d0, d1, ...) */
static void dv(const char *name, const void *data, int elem_size, int nd, ...) {
  int dims[8];
  va_list ap;
  va_start(ap, nd);
  for (int i = 0; i < nd; i++) dims[i] = va_arg(ap, int);
  va_end(ap);
  dump_raw(name, data, elem_size, nd, dims);
}
#define D16(name, ptr, ...) \
  dv(name, ptr, 2, (int)(sizeof((int[]){ __VA_ARGS__ }) / sizeof(int)), __VA_ARGS__)
#define D32(name, ptr, ...) \
  dv(name, ptr, 4, (int)(sizeof((int[]){ __VA_ARGS__ }) / sizeof(int)), __VA_ARGS__)

#define DF(field, ...) D16(#field, &fc.field, __VA_ARGS__)

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "tables.bin", "wb");
  if (!out) return 1;

  FRAME_CONTEXT fc;
  memset(&fc, 0, sizeof(fc));
  av1_init_mode_probs(&fc);
  {
    /* nmvc/ndvc defaults live behind av1_init_mv_probs(cm) */
    static AV1_COMMON cm;
    cm.fc = &fc;
    av1_init_mv_probs(&cm);
  }

  /* ---- mode CDFs (entropymode.c defaults) ---- */
  DF(newmv_cdf, NEWMV_MODE_CONTEXTS, CDF_SIZE(2));
  DF(zeromv_cdf, GLOBALMV_MODE_CONTEXTS, CDF_SIZE(2));
  DF(refmv_cdf, REFMV_MODE_CONTEXTS, CDF_SIZE(2));
  DF(drl_cdf, DRL_MODE_CONTEXTS, CDF_SIZE(2));
  DF(inter_compound_mode_cdf, INTER_MODE_CONTEXTS, CDF_SIZE(INTER_COMPOUND_MODES));
  DF(compound_type_cdf, BLOCK_SIZES_ALL, CDF_SIZE(MASKED_COMPOUND_TYPES));
  DF(wedge_idx_cdf, BLOCK_SIZES_ALL, CDF_SIZE(16));
  DF(interintra_cdf, BLOCK_SIZE_GROUPS, CDF_SIZE(2));
  DF(wedge_interintra_cdf, BLOCK_SIZES_ALL, CDF_SIZE(2));
  DF(interintra_mode_cdf, BLOCK_SIZE_GROUPS, CDF_SIZE(INTERINTRA_MODES));
  DF(motion_mode_cdf, BLOCK_SIZES_ALL, CDF_SIZE(MOTION_MODES));
  DF(obmc_cdf, BLOCK_SIZES_ALL, CDF_SIZE(2));
  DF(palette_y_size_cdf, PALATTE_BSIZE_CTXS, CDF_SIZE(PALETTE_SIZES));
  DF(palette_uv_size_cdf, PALATTE_BSIZE_CTXS, CDF_SIZE(PALETTE_SIZES));
  DF(palette_y_color_index_cdf, PALETTE_SIZES, PALETTE_COLOR_INDEX_CONTEXTS,
     CDF_SIZE(PALETTE_COLORS));
  DF(palette_uv_color_index_cdf, PALETTE_SIZES, PALETTE_COLOR_INDEX_CONTEXTS,
     CDF_SIZE(PALETTE_COLORS));
  DF(palette_y_mode_cdf, PALATTE_BSIZE_CTXS, PALETTE_Y_MODE_CONTEXTS, CDF_SIZE(2));
  DF(palette_uv_mode_cdf, PALETTE_UV_MODE_CONTEXTS, CDF_SIZE(2));
  DF(comp_inter_cdf, COMP_INTER_CONTEXTS, CDF_SIZE(2));
  DF(single_ref_cdf, REF_CONTEXTS, SINGLE_REFS - 1, CDF_SIZE(2));
  DF(comp_ref_type_cdf, COMP_REF_TYPE_CONTEXTS, CDF_SIZE(2));
  DF(uni_comp_ref_cdf, UNI_COMP_REF_CONTEXTS, UNIDIR_COMP_REFS - 1, CDF_SIZE(2));
  DF(comp_ref_cdf, REF_CONTEXTS, FWD_REFS - 1, CDF_SIZE(2));
  DF(comp_bwdref_cdf, REF_CONTEXTS, BWD_REFS - 1, CDF_SIZE(2));
  DF(txfm_partition_cdf, TXFM_PARTITION_CONTEXTS, CDF_SIZE(2));
  DF(compound_index_cdf, COMP_INDEX_CONTEXTS, CDF_SIZE(2));
  DF(comp_group_idx_cdf, COMP_GROUP_IDX_CONTEXTS, CDF_SIZE(2));
  DF(skip_mode_cdfs, SKIP_MODE_CONTEXTS, CDF_SIZE(2));
  DF(skip_txfm_cdfs, SKIP_CONTEXTS, CDF_SIZE(2));
  DF(intra_inter_cdf, INTRA_INTER_CONTEXTS, CDF_SIZE(2));
  DF(intrabc_cdf, CDF_SIZE(2));
  DF(filter_intra_cdfs, BLOCK_SIZES_ALL, CDF_SIZE(2));
  DF(filter_intra_mode_cdf, CDF_SIZE(FILTER_INTRA_MODES));
  DF(switchable_restore_cdf, CDF_SIZE(RESTORE_SWITCHABLE_TYPES));
  DF(wiener_restore_cdf, CDF_SIZE(2));
  DF(sgrproj_restore_cdf, CDF_SIZE(2));
  DF(y_mode_cdf, BLOCK_SIZE_GROUPS, CDF_SIZE(INTRA_MODES));
  DF(uv_mode_cdf, CFL_ALLOWED_TYPES, INTRA_MODES, CDF_SIZE(UV_INTRA_MODES));
  DF(partition_cdf, PARTITION_CONTEXTS, CDF_SIZE(EXT_PARTITION_TYPES));
  DF(switchable_interp_cdf, SWITCHABLE_FILTER_CONTEXTS, CDF_SIZE(SWITCHABLE_FILTERS));
  DF(kf_y_cdf, KF_MODE_CONTEXTS, KF_MODE_CONTEXTS, CDF_SIZE(INTRA_MODES));
  DF(angle_delta_cdf, DIRECTIONAL_MODES, CDF_SIZE(2 * MAX_ANGLE_DELTA + 1));
  DF(tx_size_cdf, MAX_TX_CATS, TX_SIZE_CONTEXTS, CDF_SIZE(MAX_TX_DEPTH + 1));
  DF(delta_q_cdf, CDF_SIZE(DELTA_Q_PROBS + 1));
  DF(delta_lf_multi_cdf, FRAME_LF_COUNT, CDF_SIZE(DELTA_LF_PROBS + 1));
  DF(delta_lf_cdf, CDF_SIZE(DELTA_LF_PROBS + 1));
  DF(intra_ext_tx_cdf, EXT_TX_SETS_INTRA, EXT_TX_SIZES, INTRA_MODES, CDF_SIZE(TX_TYPES));
  DF(inter_ext_tx_cdf, EXT_TX_SETS_INTER, EXT_TX_SIZES, CDF_SIZE(TX_TYPES));
  DF(cfl_sign_cdf, CDF_SIZE(CFL_JOINT_SIGNS));
  DF(cfl_alpha_cdf, CFL_ALPHA_CONTEXTS, CDF_SIZE(CFL_ALPHABET_SIZE));

  /* segmentation */
  D16("seg_pred_cdf", &fc.seg.pred_cdf, SEG_TEMPORAL_PRED_CTXS, CDF_SIZE(2));
  D16("seg_spatial_pred_cdf", &fc.seg.spatial_pred_seg_cdf,
      SPATIAL_PREDICTION_PROBS, CDF_SIZE(MAX_SEGMENTS));

  /* MV contexts (nmvc = MV, ndvc = intrabc DV) */
  for (int c = 0; c < 2; c++) {
    const nmv_context *nm = c == 0 ? &fc.nmvc : &fc.ndvc;
    char pfx[8];
    snprintf(pfx, sizeof(pfx), c == 0 ? "nmv" : "ndv");
    char nbuf[64];
#define DNMV(sub, ptr, ...)                               \
  do {                                                    \
    snprintf(nbuf, sizeof(nbuf), "%s_%s", pfx, sub);      \
    D16(nbuf, ptr, __VA_ARGS__);                          \
  } while (0)
    DNMV("joints_cdf", &nm->joints_cdf, CDF_SIZE(MV_JOINTS));
    for (int k = 0; k < 2; k++) {
      const nmv_component *cc = &nm->comps[k];
      char sb[48];
      snprintf(sb, sizeof(sb), "comp%d_classes_cdf", k);
      DNMV(sb, &cc->classes_cdf, CDF_SIZE(MV_CLASSES));
      snprintf(sb, sizeof(sb), "comp%d_class0_fp_cdf", k);
      DNMV(sb, &cc->class0_fp_cdf, CLASS0_SIZE, CDF_SIZE(MV_FP_SIZE));
      snprintf(sb, sizeof(sb), "comp%d_fp_cdf", k);
      DNMV(sb, &cc->fp_cdf, CDF_SIZE(MV_FP_SIZE));
      snprintf(sb, sizeof(sb), "comp%d_sign_cdf", k);
      DNMV(sb, &cc->sign_cdf, CDF_SIZE(2));
      snprintf(sb, sizeof(sb), "comp%d_class0_hp_cdf", k);
      DNMV(sb, &cc->class0_hp_cdf, CDF_SIZE(2));
      snprintf(sb, sizeof(sb), "comp%d_hp_cdf", k);
      DNMV(sb, &cc->hp_cdf, CDF_SIZE(2));
      snprintf(sb, sizeof(sb), "comp%d_class0_cdf", k);
      DNMV(sb, &cc->class0_cdf, CDF_SIZE(CLASS0_SIZE));
      snprintf(sb, sizeof(sb), "comp%d_bits_cdf", k);
      DNMV(sb, &cc->bits_cdf, MV_OFFSET_BITS, CDF_SIZE(2));
    }
  }

  /* ---- coefficient CDFs, all 4 q contexts (token_cdfs.h) ---- */
  D16("coef_txb_skip_cdf", av1_default_txb_skip_cdfs, TOKEN_CDF_Q_CTXS,
      TX_SIZES, TXB_SKIP_CONTEXTS, CDF_SIZE(2));
  D16("coef_eob_extra_cdf", av1_default_eob_extra_cdfs, TOKEN_CDF_Q_CTXS,
      TX_SIZES, PLANE_TYPES, EOB_COEF_CONTEXTS, CDF_SIZE(2));
  D16("coef_dc_sign_cdf", av1_default_dc_sign_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, DC_SIGN_CONTEXTS, CDF_SIZE(2));
  D16("coef_br_cdf", av1_default_coeff_lps_multi_cdfs, TOKEN_CDF_Q_CTXS,
      TX_SIZES, PLANE_TYPES, LEVEL_CONTEXTS, CDF_SIZE(BR_CDF_SIZE));
  D16("coef_base_cdf", av1_default_coeff_base_multi_cdfs, TOKEN_CDF_Q_CTXS,
      TX_SIZES, PLANE_TYPES, SIG_COEF_CONTEXTS, CDF_SIZE(4));
  D16("coef_base_eob_cdf", av1_default_coeff_base_eob_multi_cdfs,
      TOKEN_CDF_Q_CTXS, TX_SIZES, PLANE_TYPES, SIG_COEF_CONTEXTS_EOB, CDF_SIZE(3));
  D16("coef_eob_flag_cdf16", av1_default_eob_multi16_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(5));
  D16("coef_eob_flag_cdf32", av1_default_eob_multi32_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(6));
  D16("coef_eob_flag_cdf64", av1_default_eob_multi64_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(7));
  D16("coef_eob_flag_cdf128", av1_default_eob_multi128_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(8));
  D16("coef_eob_flag_cdf256", av1_default_eob_multi256_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(9));
  D16("coef_eob_flag_cdf512", av1_default_eob_multi512_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(10));
  D16("coef_eob_flag_cdf1024", av1_default_eob_multi1024_cdfs, TOKEN_CDF_Q_CTXS,
      PLANE_TYPES, 2, CDF_SIZE(11));

  /* ---- quantizer lookup tables (quant_common.c) ---- */
  {
    int32_t dcq[3][QINDEX_RANGE], acq[3][QINDEX_RANGE];
    const aom_bit_depth_t bds[3] = { AOM_BITS_8, AOM_BITS_10, AOM_BITS_12 };
    for (int b = 0; b < 3; b++)
      for (int q = 0; q < QINDEX_RANGE; q++) {
        dcq[b][q] = av1_dc_quant_QTX(q, 0, bds[b]);
        acq[b][q] = av1_ac_quant_QTX(q, 0, bds[b]);
      }
    D32("dc_quant_qtx", dcq, 3, QINDEX_RANGE);
    D32("ac_quant_qtx", acq, 3, QINDEX_RANGE);
  }

  /* ---- scan orders (scan.c): flatten per (tx_size, tx_type) ---- */
  {
    for (int ts = 0; ts < TX_SIZES_ALL; ts++) {
      const int w = tx_size_wide[ts], h = tx_size_high[ts];
      const int n = w * h;
      for (int tt = 0; tt < TX_TYPES; tt++) {
        char nbuf[64];
        snprintf(nbuf, sizeof(nbuf), "scan_ts%d_tt%d", ts, tt);
        D16(nbuf, av1_scan_orders[ts][tt].scan, n);
      }
    }
  }

  /* ---- transform cosine tables (av1_txfm.c) ---- */
  D32("cospi_arr", av1_cospi_arr_data, 4, 64);
  D32("sinpi_arr", av1_sinpi_arr_data, 4, 5);

  /* ---- self-guided restoration lookups (restoration.c:645,668) ---- */
  {
    extern const int32_t av1_x_by_xplus1[256];
    extern const int32_t av1_one_by_x[25];
    D32("x_by_xplus1", av1_x_by_xplus1, 256);
    D32("one_by_x", av1_one_by_x, 25);
  }

  /* ---- coefficient-coding tables (txb_common.c / entropy.c) ---- */
  {
    extern const int16_t av1_eob_group_start[12];
    extern const int16_t av1_eob_offset_bits[12];
    extern const int8_t *av1_nz_map_ctx_offset[TX_SIZES_ALL];
    D16("eob_group_start", av1_eob_group_start, 12);
    D16("eob_offset_bits", av1_eob_offset_bits, 12);
    for (int ts = 0; ts < TX_SIZES_ALL; ts++) {
      /* table covers the adjusted (<=32-dim) transform area */
      TX_SIZE adj = av1_get_adjusted_tx_size(ts);
      int n = tx_size_wide[adj] * tx_size_high[adj];
      int8_t tmp[32 * 32];
      memcpy(tmp, av1_nz_map_ctx_offset[ts], n);
      char nbuf[48];
      snprintf(nbuf, sizeof(nbuf), "nz_map_ctx_offset_ts%d", ts);
      int dims[1] = { n };
      /* widen to u16 records */
      uint16_t wide[32 * 32];
      for (int i = 0; i < n; i++) wide[i] = (uint16_t)tmp[i];
      dump_raw(nbuf, wide, 2, 1, dims);
    }
  }

  fclose(out);
  fprintf(stderr, "tables dumped\n");
  return 0;
}
