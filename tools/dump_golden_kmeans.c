#include <stdio.h>
#include <string.h>
#include <stdint.h>
#include "config/aom_config.h"
#include "config/av1_rtcd.h"
int main(void){
  FILE *f = fopen("/tmp/golden_kmeans.bin","wb");
  uint32_t st = 0x1221;
  #define LCG() (st = st*1103515245u+12345u, st>>16)
  for (int c = 0; c < 6; c++) {
    int n = 64 + (c * 37) % 100, k = 2 + c;
    static int16_t data[512], cents[16];
    for (int i = 0; i < n * 2; i++) data[i] = LCG() % 256;
    for (int i = 0; i < k * 2; i++) cents[i] = LCG() % 256;
    static uint8_t idx1[512], idx2[512];
    int64_t d1, d2;
    av1_calc_indices_dim1_c(data, cents, idx1, &d1, n, k);
    av1_calc_indices_dim2_c(data, cents, idx2, &d2, n, k);
    /* record format */
    char name[32]; uint32_t nl, es, nd, dim;
    #define DUMP(nm, ptr, e, cnt) do { \
      snprintf(name, sizeof(name), nm, c); nl = strlen(name); \
      fwrite(&nl,4,1,f); fwrite(name,1,nl,f); es=e; nd=1; dim=cnt; \
      fwrite(&es,4,1,f); fwrite(&nd,4,1,f); fwrite(&dim,4,1,f); \
      fwrite(ptr,e,cnt,f); } while(0)
    int32_t meta[2] = { n, k };
    DUMP("km%d_meta", meta, 4, 2);
    static int32_t d32[1024]; for (int i = 0; i < n*2; i++) d32[i] = data[i];
    DUMP("km%d_data", d32, 4, n*2);
    static int32_t c32[32]; for (int i = 0; i < k*2; i++) c32[i] = cents[i];
    DUMP("km%d_cents", c32, 4, k*2);
    DUMP("km%d_idx1", idx1, 1, n);
    DUMP("km%d_idx2", idx2, 1, n);
    int32_t dd[2] = { (int32_t)d1, (int32_t)d2 };
    DUMP("km%d_dist", dd, 4, 2);
  }
  fclose(f);
  fprintf(stderr, "kmeans dumped\n");
  return 0;
}
