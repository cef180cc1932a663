/* Test-oracle tool: dump a JPEG's quantized DCT coefficients via libjpeg.
 *
 * Used ONLY by the test suite to validate the from-scratch native codec
 * against libjpeg's decoder (the framework itself never links libjpeg).
 *
 * Output format (little-endian):
 *   int32 width, height, ncomps
 *   per comp: int32 id, h, v, qno, width_in_blocks, height_in_blocks
 *   per comp: int32 quant[64] (natural order)
 *   per comp: int16 coefs[height_in_blocks][width_in_blocks][64] natural order
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

static const int zz[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: dump_coefs in.jpg out.bin\n");
    return 2;
  }
  FILE* in = fopen(argv[1], "rb");
  FILE* out = fopen(argv[2], "wb");
  if (!in || !out) return 2;

  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, in);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr* coefs = jpeg_read_coefficients(&cinfo);

  int32_t v;
  v = cinfo.image_width; fwrite(&v, 4, 1, out);
  v = cinfo.image_height; fwrite(&v, 4, 1, out);
  v = cinfo.num_components; fwrite(&v, 4, 1, out);
  int c;
  for (c = 0; c < cinfo.num_components; c++) {
    jpeg_component_info* ci = &cinfo.comp_info[c];
    v = ci->component_id; fwrite(&v, 4, 1, out);
    v = ci->h_samp_factor; fwrite(&v, 4, 1, out);
    v = ci->v_samp_factor; fwrite(&v, 4, 1, out);
    v = ci->quant_tbl_no; fwrite(&v, 4, 1, out);
    v = ci->width_in_blocks; fwrite(&v, 4, 1, out);
    v = ci->height_in_blocks; fwrite(&v, 4, 1, out);
  }
  for (c = 0; c < cinfo.num_components; c++) {
    jpeg_component_info* ci = &cinfo.comp_info[c];
    JQUANT_TBL* qt = cinfo.quant_tbl_ptrs[ci->quant_tbl_no];
    int32_t q[64];
    int k;
    /* libjpeg stores quantval in natural order already */
    for (k = 0; k < 64; k++) q[k] = qt ? qt->quantval[k] : 0;
    fwrite(q, 4, 64, out);
  }
  for (c = 0; c < cinfo.num_components; c++) {
    jpeg_component_info* ci = &cinfo.comp_info[c];
    JDIMENSION r;
    for (r = 0; r < ci->height_in_blocks; r++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[c], r, 1, FALSE);
      JDIMENSION b;
      for (b = 0; b < ci->width_in_blocks; b++) {
        int16_t nat[64];
        int k;
        /* libjpeg coefficient blocks are in natural order already */
        for (k = 0; k < 64; k++) nat[k] = rows[0][b][k];
        fwrite(nat, 2, 64, out);
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(in);
  fclose(out);
  return 0;
}
