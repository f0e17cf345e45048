/*
 * dump_symbols.c — encode a y4m with the CONFIG_BITSTREAM_DEBUG reference
 * build and dump the exact symbol sequence (value, nsymbs, cdf) the encoder
 * wrote, plus the bitstream itself. Used to pinpoint the first diverging
 * symbol in our decoder (tests/tools debugging only).
 *
 * Build: gcc tools/dump_symbols.c -I$REF -I$DBGBUILD $DBGBUILD/libaom.a -lm -lpthread
 * Usage: dump_symbols in.y4m out.ivf out.syms [cpu_used] [base_q] [enable_cdef] [enable_lr]
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "config/aom_config.h"
#include "aom/aom_encoder.h"
#include "aom/aomcx.h"
#include "aom_util/debug_util.h"

static void die(const char *m) {
  fprintf(stderr, "%s\n", m);
  exit(1);
}

static int read_y4m_header(FILE *f, int *w, int *h) {
  char line[256];
  if (!fgets(line, sizeof(line), f)) return 0;
  if (strncmp(line, "YUV4MPEG2", 9) != 0) return 0;
  char *p = strtok(line + 9, " \n");
  while (p) {
    if (p[0] == 'W') *w = atoi(p + 1);
    if (p[0] == 'H') *h = atoi(p + 1);
    p = strtok(NULL, " \n");
  }
  return 1;
}

static FILE *ivf;
static int frame_count = 0;

static void write_u16(FILE *f, unsigned v) { fputc(v & 255, f); fputc(v >> 8, f); }
static void write_u32(FILE *f, unsigned v) {
  fputc(v & 255, f); fputc((v >> 8) & 255, f);
  fputc((v >> 16) & 255, f); fputc((v >> 24) & 255, f);
}

int main(int argc, char **argv) {
  if (argc < 4) die("usage: dump_symbols in.y4m out.ivf out.syms [cpu] [q]");
  int cpu_used = argc > 4 ? atoi(argv[4]) : 6;
  int base_q = argc > 5 ? atoi(argv[5]) : 0; /* 0 => lossless */

  FILE *fin = fopen(argv[1], "rb");
  if (!fin) die("open y4m");
  int w = 0, h = 0;
  if (!read_y4m_header(fin, &w, &h)) die("bad y4m");

  aom_codec_ctx_t codec;
  aom_codec_enc_cfg_t cfg;
  aom_codec_iface_t *iface = aom_codec_av1_cx();
  if (aom_codec_enc_config_default(iface, &cfg, AOM_USAGE_GOOD_QUALITY))
    die("cfg");
  cfg.g_w = w;
  cfg.g_h = h;
  cfg.g_threads = 1;
  cfg.g_lag_in_frames = 0;
  cfg.g_pass = AOM_RC_ONE_PASS;
  /* AOM_DS_RESIZE=<denom 9..16>: fixed frame-resize mode (scaled refs) */
  const char *resize_env = getenv("AOM_DS_RESIZE");
  if (resize_env && atoi(resize_env) > 8) {
    cfg.rc_resize_mode = 1;
    cfg.rc_resize_denominator = atoi(resize_env);
  }
  /* optional two-pass flow (AOM_DS_PASSES=2): stats pass first */
  aom_fixed_buf_t stats = { NULL, 0 };
  const char *passes_env = getenv("AOM_DS_PASSES");
  if (passes_env && atoi(passes_env) == 2) {
    aom_codec_enc_cfg_t cfg1 = cfg;
    cfg1.g_pass = AOM_RC_FIRST_PASS;
    const char *e2;
    if ((e2 = getenv("AOM_DS_KF_DIST"))) {
      cfg1.kf_min_dist = 0;
      cfg1.kf_max_dist = atoi(e2);
    }
    if ((e2 = getenv("AOM_DS_LAG"))) cfg1.g_lag_in_frames = atoi(e2);
    aom_codec_ctx_t c1;
    if (aom_codec_enc_init(&c1, iface, &cfg1, 0)) die("init pass1");
    aom_codec_control(&c1, AOME_SET_CPUUSED, cpu_used);
    aom_image_t img1;
    if (!aom_img_alloc(&img1, AOM_IMG_FMT_I420, w, h, 1)) die("img1");
    FILE *fin1 = fopen(argv[1], "rb");
    int w1, h1;
    read_y4m_header(fin1, &w1, &h1);
    size_t fsz1 = (size_t)w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2);
    static char fb1[1 << 22];
    int pts1 = 0;
    for (;;) {
      char marker1[8];
      if (!fgets(marker1, sizeof(marker1), fin1)) break;
      if (strncmp(marker1, "FRAME", 5) != 0) break;
      if (fread(fb1, 1, fsz1, fin1) != fsz1) break;
      const unsigned char *s1 = (unsigned char *)fb1;
      for (int rr = 0; rr < h; rr++)
        memcpy(img1.planes[0] + rr * img1.stride[0], s1 + (size_t)rr * w, w);
      s1 += (size_t)w * h;
      int cw1 = (w + 1) / 2, ch1 = (h + 1) / 2;
      for (int rr = 0; rr < ch1; rr++)
        memcpy(img1.planes[1] + rr * img1.stride[1], s1 + (size_t)rr * cw1, cw1);
      s1 += (size_t)cw1 * ch1;
      for (int rr = 0; rr < ch1; rr++)
        memcpy(img1.planes[2] + rr * img1.stride[2], s1 + (size_t)rr * cw1, cw1);
      aom_codec_encode(&c1, &img1, pts1++, 1, 0);
      const aom_codec_cx_pkt_t *pk;
      aom_codec_iter_t it = NULL;
      while ((pk = aom_codec_get_cx_data(&c1, &it)) != NULL) {
        if (pk->kind == AOM_CODEC_STATS_PKT) {
          stats.buf = realloc(stats.buf, stats.sz + pk->data.twopass_stats.sz);
          memcpy((char *)stats.buf + stats.sz, pk->data.twopass_stats.buf,
                 pk->data.twopass_stats.sz);
          stats.sz += pk->data.twopass_stats.sz;
        }
      }
    }
    while (aom_codec_encode(&c1, NULL, -1, 1, 0) == AOM_CODEC_OK) {
      const aom_codec_cx_pkt_t *pk;
      aom_codec_iter_t it = NULL;
      int got1 = 0;
      while ((pk = aom_codec_get_cx_data(&c1, &it)) != NULL) {
        got1 = 1;
        if (pk->kind == AOM_CODEC_STATS_PKT) {
          stats.buf = realloc(stats.buf, stats.sz + pk->data.twopass_stats.sz);
          memcpy((char *)stats.buf + stats.sz, pk->data.twopass_stats.buf,
                 pk->data.twopass_stats.sz);
          stats.sz += pk->data.twopass_stats.sz;
        }
      }
      if (!got1) break;
    }
    fclose(fin1);
    aom_codec_destroy(&c1);
    aom_img_free(&img1);
    cfg.g_pass = AOM_RC_LAST_PASS;
    cfg.rc_twopass_stats_in = stats;
    cfg.g_lag_in_frames = 19;
  }
  cfg.kf_min_dist = 0;
  cfg.kf_max_dist = 1;
  cfg.rc_end_usage = AOM_Q;
  /* argv[8]: superres denominator (9..16) -> fixed superres mode;
     argv[9] (optional): kf denominator (defaults to argv[8]);
     argv[10] (optional): enable quantizer matrices (qm-min 2, qm-max 5) */
  if (argc > 8 && atoi(argv[8]) > 8) {
    cfg.rc_superres_mode = AOM_SUPERRES_FIXED;
    cfg.rc_superres_denominator = atoi(argv[8]);
    cfg.rc_superres_kf_denominator =
        argc > 9 ? atoi(argv[9]) : atoi(argv[8]);
  }
  if (aom_codec_enc_init(&codec, iface, &cfg, 0)) die("init");
  aom_codec_control(&codec, AOME_SET_CPUUSED, cpu_used);
  if (base_q == 0) {
    aom_codec_control(&codec, AV1E_SET_LOSSLESS, 1);
  } else {
    aom_codec_control(&codec, AOME_SET_CQ_LEVEL, base_q);
  }
  if (argc > 6 && atoi(argv[6]) == 0)
    aom_codec_control(&codec, AV1E_SET_ENABLE_CDEF, 0);
  if (argc <= 7 || atoi(argv[7]) == 0)
    aom_codec_control(&codec, AV1E_SET_ENABLE_RESTORATION, 0);
  if (argc > 10 && atoi(argv[10])) {
    aom_codec_control(&codec, AV1E_SET_ENABLE_QM, 1);
    aom_codec_control(&codec, AV1E_SET_QM_MIN, 2);
    aom_codec_control(&codec, AV1E_SET_QM_MAX, 5);
  }
  /* inter-coding knobs via env vars (AOM_DS_*), so existing positional
     args keep working: KF_DIST + per-tool enables */
  {
    const char *e;
    if ((e = getenv("AOM_DS_KF_DIST"))) {
      cfg.kf_min_dist = 0;
      cfg.kf_max_dist = atoi(e);
      aom_codec_enc_config_set(&codec, &cfg);
    }
    if ((e = getenv("AOM_DS_LAG"))) {
      cfg.g_lag_in_frames = atoi(e);
      aom_codec_enc_config_set(&codec, &cfg);
    }
#define DS_CTRL(env, ctrl) \
    if ((e = getenv(env))) aom_codec_control(&codec, ctrl, atoi(e));
    DS_CTRL("AOM_DS_OBMC", AV1E_SET_ENABLE_OBMC)
    DS_CTRL("AOM_DS_WARP", AV1E_SET_ENABLE_WARPED_MOTION)
    DS_CTRL("AOM_DS_GM", AV1E_SET_ENABLE_GLOBAL_MOTION)
    DS_CTRL("AOM_DS_DUAL", AV1E_SET_ENABLE_DUAL_FILTER)
    DS_CTRL("AOM_DS_MASKED", AV1E_SET_ENABLE_MASKED_COMP)
    DS_CTRL("AOM_DS_INTERINTRA", AV1E_SET_ENABLE_INTERINTRA_COMP)
    DS_CTRL("AOM_DS_DISTWTD", AV1E_SET_ENABLE_DIST_WTD_COMP)
    DS_CTRL("AOM_DS_REFMVS", AV1E_SET_ENABLE_REF_FRAME_MVS)
#undef DS_CTRL
  }
  aom_image_t img;
  if (!aom_img_alloc(&img, AOM_IMG_FMT_I420, w, h, 1)) die("img");

  ivf = fopen(argv[2], "wb");
  FILE *syms = fopen(argv[3], "wb");
  fwrite("DKIF", 1, 4, ivf);
  write_u16(ivf, 0); write_u16(ivf, 32);
  fwrite("AV01", 1, 4, ivf);
  write_u16(ivf, w); write_u16(ivf, h);
  write_u32(ivf, 30); write_u32(ivf, 1);
  write_u32(ivf, 0); write_u32(ivf, 0); /* patch count later */

  int prev_queue_w = 0;
  char frame_buf[1 << 22];
  size_t fsz = (size_t)w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2);
  int pts = 0;
  for (;;) {
    char marker[8];
    if (!fgets(marker, sizeof(marker), fin)) break;
    if (strncmp(marker, "FRAME", 5) != 0) break;
    if (fread(frame_buf, 1, fsz, fin) != fsz) break;
    const unsigned char *src = (unsigned char *)frame_buf;
    for (int r = 0; r < h; r++)
      memcpy(img.planes[0] + r * img.stride[0], src + (size_t)r * w, w);
    src += (size_t)w * h;
    int cw = (w + 1) / 2, ch = (h + 1) / 2;
    for (int r = 0; r < ch; r++)
      memcpy(img.planes[1] + r * img.stride[1], src + (size_t)r * cw, cw);
    src += (size_t)cw * ch;
    for (int r = 0; r < ch; r++)
      memcpy(img.planes[2] + r * img.stride[2], src + (size_t)r * cw, cw);

    if (aom_codec_encode(&codec, &img, pts++, 1, 0)) die("encode");
    const aom_codec_cx_pkt_t *pkt;
    aom_codec_iter_t iter = NULL;
    while ((pkt = aom_codec_get_cx_data(&codec, &iter)) != NULL) {
      if (pkt->kind == AOM_CODEC_CX_FRAME_PKT) {
        write_u32(ivf, (unsigned)pkt->data.frame.sz);
        write_u32(ivf, pts); write_u32(ivf, 0);
        fwrite(pkt->data.frame.buf, 1, pkt->data.frame.sz, ivf);
        frame_count++;
        /* dump this frame's symbols: queue entries prev..queue_w */
        int qw = bitstream_queue_get_write();
        int marker2[2] = { -1, qw - prev_queue_w };
        fwrite(marker2, sizeof(int), 2, syms);
        for (int i = prev_queue_w; i != qw; i = (i + 1)) {
          /* pop sequentially via the read API */
          int result, nsymbs;
          aom_cdf_prob cdf[16];
          bitstream_queue_pop(&result, cdf, &nsymbs);
          int rec[2] = { result, nsymbs };
          fwrite(rec, sizeof(int), 2, syms);
          fwrite(cdf, sizeof(aom_cdf_prob), 16, syms);
        }
        prev_queue_w = qw;
      }
    }
  }
  /* flush */
  while (aom_codec_encode(&codec, NULL, -1, 1, 0) == AOM_CODEC_OK) {
    const aom_codec_cx_pkt_t *pkt;
    aom_codec_iter_t iter = NULL;
    int got = 0;
    while ((pkt = aom_codec_get_cx_data(&codec, &iter)) != NULL) {
      got = 1;
      if (pkt->kind == AOM_CODEC_CX_FRAME_PKT) {
        write_u32(ivf, (unsigned)pkt->data.frame.sz);
        write_u32(ivf, pts); write_u32(ivf, 0);
        fwrite(pkt->data.frame.buf, 1, pkt->data.frame.sz, ivf);
        frame_count++;
        int qw = bitstream_queue_get_write();
        int marker2[2] = { -1, qw - prev_queue_w };
        fwrite(marker2, sizeof(int), 2, syms);
        for (int i = prev_queue_w; i != qw; i = (i + 1)) {
          int result, nsymbs;
          aom_cdf_prob cdf[16];
          bitstream_queue_pop(&result, cdf, &nsymbs);
          int rec[2] = { result, nsymbs };
          fwrite(rec, sizeof(int), 2, syms);
          fwrite(cdf, sizeof(aom_cdf_prob), 16, syms);
        }
        prev_queue_w = qw;
      }
    }
    if (!got) break;
  }
  fseek(ivf, 24, SEEK_SET);
  write_u32(ivf, frame_count);
  fclose(ivf);
  fclose(syms);
  fprintf(stderr, "frames: %d\n", frame_count);
  aom_codec_destroy(&codec);
  return 0;
}
