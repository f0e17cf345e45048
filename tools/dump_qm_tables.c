/* dump_qm_tables.c — extract the AV1 quantizer-matrix tables
 * (av1/common/quant_common.c iwt_matrix_ref via av1_qm_init pointers)
 * into the record format for normative/data/qm_tables.npz.
 * Build: gcc tools/dump_qm_tables.c -I$REF -I$REFBUILD -lm $REFBUILD/libaom.a
 */
#include <stdio.h>
#include <string.h>
#include <stdint.h>
#include "config/aom_config.h"
#include "config/av1_rtcd.h"
#include "av1/common/quant_common.h"
#include "av1/common/av1_common_int.h"

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

int main(int argc, char **argv) {
  out = fopen(argc > 1 ? argv[1] : "qm_tables.bin", "wb");
  static CommonQuantParams qp;
  av1_qm_init(&qp, 2);
  char name[64];
  for (int q = 0; q < NUM_QM_LEVELS - 1; q++) {
    for (int c = 0; c < 2; c++) {
      for (int t = 0; t < TX_SIZES_ALL; t++) {
        if ((TX_SIZE)t != av1_get_adjusted_tx_size((TX_SIZE)t)) continue;
        const qm_val_t *m = qp.giqmatrix[q][c][t];
        const int w = tx_size_wide[t], h = tx_size_high[t];
        int d[2] = { h, w };  /* C raster: pos = (row << bwl) + col */
        snprintf(name, sizeof(name), "iqm_q%d_c%d_t%d", q, c, t);
        dump_raw(name, m, 1, 2, d);
      }
    }
  }
  fclose(out);
  fprintf(stderr, "qm tables dumped\n");
  return 0;
}
