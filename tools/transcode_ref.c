/* Test oracle: lossless libjpeg transcode with selectable entropy mode.
 *
 * Reads a JPEG's coefficients with libjpeg and rewrites them with the
 * requested coding options, producing a pure libjpeg-authored bitstream in
 * any mode (baseline huffman / optimized tables / progressive / arithmetic /
 * restart markers).  Used by tests/test_differential_fuzz.py to generate
 * ground-truth files our decoder must agree with (the reference library
 * delegates all of its I/O to exactly this libjpeg machinery —
 * /root/reference/src/image.c:94,191-194).
 *
 *   transcode_ref in.jpg out.jpg [arith] [progressive] [optimize] [restart N]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s in.jpg out.jpg [arith] [progressive] "
                        "[optimize] [restart N]\n", argv[0]);
        return 2;
    }
    struct jpeg_decompress_struct din;
    struct jpeg_compress_struct cout;
    struct jpeg_error_mgr jerr1, jerr2;

    din.err = jpeg_std_error(&jerr1);
    jpeg_create_decompress(&din);
    FILE *fi = fopen(argv[1], "rb");
    if (!fi) { perror(argv[1]); return 1; }
    jpeg_stdio_src(&din, fi);
    jpeg_read_header(&din, TRUE);
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&din);

    cout.err = jpeg_std_error(&jerr2);
    jpeg_create_compress(&cout);
    FILE *fo = fopen(argv[2], "wb");
    if (!fo) { perror(argv[2]); return 1; }
    jpeg_stdio_dest(&cout, fo);
    jpeg_copy_critical_parameters(&din, &cout);

    for (int i = 3; i < argc; i++) {
        if (!strcmp(argv[i], "arith")) {
            cout.arith_code = TRUE;
        } else if (!strcmp(argv[i], "progressive")) {
            jpeg_simple_progression(&cout);
        } else if (!strcmp(argv[i], "optimize")) {
            cout.optimize_coding = TRUE;
        } else if (!strcmp(argv[i], "restart") && i + 1 < argc) {
            cout.restart_interval = (unsigned) atoi(argv[++i]);
        } else {
            fprintf(stderr, "unknown option %s\n", argv[i]);
            return 2;
        }
    }

    jpeg_write_coefficients(&cout, coefs);
    jpeg_finish_compress(&cout);
    jpeg_destroy_compress(&cout);
    jpeg_finish_decompress(&din);
    jpeg_destroy_decompress(&din);
    fclose(fi);
    fclose(fo);
    return 0;
}
