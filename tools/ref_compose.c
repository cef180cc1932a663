/* Test-oracle: drive the reference libmodjpeg library directly, exposing
 * paths the modjpeg CLI doesn't (arbitrary uniform blend values, raw
 * dropons).  Linked against the library built in .refbuild; test-only.
 *
 * usage: ref_compose in.jpg dropon.{png,jpg} blend align_flags off_x off_y out.jpg
 *   align_flags: bitmask, same values as MJ_ALIGN_* (L=1 R=2 T=4 B=8 C=16)
 */
#include <stdio.h>
#include <stdlib.h>
#include "libmodjpeg.h"

int main(int argc, char** argv) {
  if (argc != 8) {
    fprintf(stderr, "usage: ref_compose in.jpg dropon blend align offx offy out.jpg\n");
    return 2;
  }
  mj_jpeg_t m;
  mj_dropon_t d;
  mj_init_jpeg(&m);
  mj_init_dropon(&d);
  if (mj_read_jpeg_from_file(&m, argv[1], 0) != MJ_OK) return 3;
  if (mj_read_dropon_from_file(&d, argv[2], NULL, (short)atoi(argv[3])) != MJ_OK)
    return 4;
  if (mj_compose(&m, &d, (unsigned)atoi(argv[4]), atoi(argv[5]), atoi(argv[6])) != MJ_OK)
    return 5;
  if (mj_write_jpeg_to_file(&m, argv[7], 0) != MJ_OK) return 6;
  mj_free_jpeg(&m);
  mj_free_dropon(&d);
  return 0;
}
