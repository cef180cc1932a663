/* Generate in-the-wild interop fixtures AUTHORED BY a foreign encoder
 * (the system libjpeg-turbo this box ships, the same library the
 * reference links): deterministic synthetic photo content encoded under
 * the settings matrix the reference documents as its tested envelope
 * (/root/reference/README.md:166-175 — libjpeg v6b..v9c, libjpeg-turbo,
 * mozjpeg).  The committed outputs live in tests/fixtures/interop/ and
 * tests/test_interop_fixtures.py decodes/composes/re-encodes them
 * against the dump_coefs oracle.
 *
 * Build: gcc -O2 tools/make_interop_fixtures.c -ljpeg -o /tmp/mkinterop
 * Run:   /tmp/mkinterop tests/fixtures/interop
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include <jpeglib.h>

#define W 328
#define H 246

static unsigned char rgb[W * H * 3];

static void fill_image(void) {
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      double base = 128 + 80 * sin(x / 23.0) * cos(y / 17.0) +
                    30 * sin((x + 2 * y) / 9.0);
      /* blocky texture so the entropy stream has realistic density */
      double tex = ((x / 8 * 1103515245u + y / 8 * 12345u) % 64) - 32;
      unsigned char* p = rgb + (y * W + x) * 3;
      double r = base + tex, g = base * 0.92 + tex * 0.5 + 12,
             b = base * 1.06 - tex;
      p[0] = r < 0 ? 0 : r > 255 ? 255 : (unsigned char)r;
      p[1] = g < 0 ? 0 : g > 255 ? 255 : (unsigned char)g;
      p[2] = b < 0 ? 0 : b > 255 ? 255 : (unsigned char)b;
    }
}

struct Cfg {
  const char* name;
  int quality;
  int progressive;
  int optimize;
  int arith;
  int restart_interval;
  int h2, v2;       /* luma sampling factors */
  int grayscale;
};

static int encode_one(const char* dir, const struct Cfg* c) {
  char path[512];
  snprintf(path, sizeof(path), "%s/%s.jpg", dir, c->name);
  FILE* f = fopen(path, "wb");
  if (!f) { perror(path); return 1; }

  struct jpeg_compress_struct ci;
  struct jpeg_error_mgr jerr;
  ci.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&ci);
  jpeg_stdio_dest(&ci, f);
  ci.image_width = W;
  ci.image_height = H;
  if (c->grayscale) {
    ci.input_components = 1;
    ci.in_color_space = JCS_GRAYSCALE;
  } else {
    ci.input_components = 3;
    ci.in_color_space = JCS_RGB;
  }
  jpeg_set_defaults(&ci);
  jpeg_set_quality(&ci, c->quality, TRUE);
  if (!c->grayscale) {
    ci.comp_info[0].h_samp_factor = c->h2;
    ci.comp_info[0].v_samp_factor = c->v2;
    ci.comp_info[1].h_samp_factor = 1;
    ci.comp_info[1].v_samp_factor = 1;
    ci.comp_info[2].h_samp_factor = 1;
    ci.comp_info[2].v_samp_factor = 1;
  }
  if (c->progressive) jpeg_simple_progression(&ci);
  ci.optimize_coding = c->optimize ? TRUE : FALSE;
#ifdef C_ARITH_CODING_SUPPORTED
  ci.arith_code = c->arith ? TRUE : FALSE;
#else
  if (c->arith) { fclose(f); remove(path); jpeg_destroy_compress(&ci); return 2; }
#endif
  ci.restart_interval = (unsigned)c->restart_interval;
  jpeg_start_compress(&ci, TRUE);
  /* EXIF-shaped APP1 + a COM, like phone-camera output */
  static const unsigned char exif[] = {
      'E', 'x', 'i', 'f', 0, 0, 'M', 'M', 0, 42, 0, 0, 0, 8, 0, 1,
      1, 0x0F, 0, 2, 0, 0, 0, 8, 0, 0, 0, 26,
      'i', 'n', 't', 'e', 'r', 'o', 'p', 0};
  jpeg_write_marker(&ci, JPEG_APP0 + 1, exif, (unsigned)sizeof(exif));
  jpeg_write_marker(&ci, JPEG_COM, (const JOCTET*)"turbo-interop", 13);
  unsigned char gray[W];
  while (ci.next_scanline < ci.image_height) {
    JSAMPROW row;
    if (c->grayscale) {
      const unsigned char* src = rgb + (size_t)ci.next_scanline * W * 3;
      for (int x = 0; x < W; ++x)
        gray[x] = (unsigned char)((src[3 * x] * 299 + src[3 * x + 1] * 587 +
                                   src[3 * x + 2] * 114) / 1000);
      row = gray;
    } else {
      row = rgb + (size_t)ci.next_scanline * W * 3;
    }
    jpeg_write_scanlines(&ci, &row, 1);
  }
  jpeg_finish_compress(&ci);
  jpeg_destroy_compress(&ci);
  fclose(f);
  printf("wrote %s\n", path);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s OUTDIR\n", argv[0]); return 2; }
  fill_image();
  const struct Cfg cfgs[] = {
      {"turbo_baseline_420_q85", 85, 0, 0, 0, 0, 2, 2, 0},
      {"turbo_baseline_444_q92", 92, 0, 0, 0, 0, 1, 1, 0},
      {"turbo_optimized_422_q80", 80, 0, 1, 0, 0, 2, 1, 0},
      {"turbo_progressive_420_q85", 85, 1, 1, 0, 0, 2, 2, 0},
      {"turbo_progressive_444_q90", 90, 1, 1, 0, 0, 1, 1, 0},
      {"turbo_restart_420_q85", 85, 0, 0, 0, 4, 2, 2, 0},
      {"turbo_arith_420_q85", 85, 0, 0, 1, 0, 2, 2, 0},
      {"turbo_arith_progressive_q85", 85, 1, 0, 1, 0, 2, 2, 0},
      {"turbo_gray_q85", 85, 0, 0, 0, 0, 1, 1, 1},
  };
  int skipped = 0;
  for (size_t i = 0; i < sizeof(cfgs) / sizeof(cfgs[0]); ++i) {
    int rc = encode_one(argv[1], &cfgs[i]);
    if (rc == 2) { printf("skip (no arith): %s\n", cfgs[i].name); ++skipped; }
    else if (rc) return 1;
  }
  printf("done (%d skipped)\n", skipped);
  return 0;
}
