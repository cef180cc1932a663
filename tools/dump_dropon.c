/* Test-oracle: dump the reference library's COMPILED dropon (image + alpha
 * blocks, float32) so the bit-exact compile path can be validated stage by
 * stage.  Linked against the library built in .refbuild; test-only.
 *
 * usage: dump_dropon dropon.{png,jpg} sampling blockoff_x blockoff_y \
 *                    crop_x crop_y crop_w crop_h out.bin
 *   sampling: "420" | "422" | "444" | "gray"
 *
 * output format (little endian):
 *   int32 image_ncomponents
 *   per component: int32 h_samp, v_samp, width_in_blocks, height_in_blocks
 *                  then width*height*64 float32 (image blocks)
 *   int32 alpha_ncomponents
 *   per component: same layout (alpha weight blocks)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libmodjpeg.h"

static void dump_side(FILE *f, int n, mj_component_t *comps) {
    int c, b;
    fwrite(&n, 4, 1, f);
    for (c = 0; c < n; c++) {
        mj_component_t *co = &comps[c];
        int hdr[4] = {co->h_samp_factor, co->v_samp_factor,
                      co->width_in_blocks, co->height_in_blocks};
        fwrite(hdr, 4, 4, f);
        for (b = 0; b < co->nblocks; b++)
            fwrite(co->blocks[b], 4, 64, f);
    }
}

int main(int argc, char **argv) {
    if (argc != 10) {
        fprintf(stderr, "usage: dump_dropon dropon samp bx by cx cy cw ch out\n");
        return 2;
    }
    mj_dropon_t d;
    mj_init_dropon(&d);
    if (mj_read_dropon_from_file(&d, argv[1], NULL, MJ_BLEND_FULL) != MJ_OK)
        return 3;

    mj_sampling_t s;
    memset(&s, 0, sizeof(s));
    if (!strcmp(argv[2], "420")) {
        s.max_h_samp_factor = 2; s.max_v_samp_factor = 2;
        s.samp_factor[0].h_samp_factor = 2; s.samp_factor[0].v_samp_factor = 2;
        s.samp_factor[1].h_samp_factor = 1; s.samp_factor[1].v_samp_factor = 1;
        s.samp_factor[2].h_samp_factor = 1; s.samp_factor[2].v_samp_factor = 1;
    } else if (!strcmp(argv[2], "422")) {
        s.max_h_samp_factor = 2; s.max_v_samp_factor = 1;
        s.samp_factor[0].h_samp_factor = 2; s.samp_factor[0].v_samp_factor = 1;
        s.samp_factor[1].h_samp_factor = 1; s.samp_factor[1].v_samp_factor = 1;
        s.samp_factor[2].h_samp_factor = 1; s.samp_factor[2].v_samp_factor = 1;
    } else if (!strcmp(argv[2], "444")) {
        s.max_h_samp_factor = 1; s.max_v_samp_factor = 1;
        s.samp_factor[0].h_samp_factor = 1; s.samp_factor[0].v_samp_factor = 1;
        s.samp_factor[1].h_samp_factor = 1; s.samp_factor[1].v_samp_factor = 1;
        s.samp_factor[2].h_samp_factor = 1; s.samp_factor[2].v_samp_factor = 1;
    } else {
        s.max_h_samp_factor = 1; s.max_v_samp_factor = 1;
        s.samp_factor[0].h_samp_factor = 1; s.samp_factor[0].v_samp_factor = 1;
    }
    s.h_factor = s.max_h_samp_factor * 8;
    s.v_factor = s.max_v_samp_factor * 8;

    mj_compileddropon_t cd;
    memset(&cd, 0, sizeof(cd));
    int rv = mj_compile_dropon(&cd, &d, !strcmp(argv[2], "gray") ?
                                   JCS_GRAYSCALE : JCS_YCbCr, &s,
                               atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
                               atoi(argv[6]), atoi(argv[7]), atoi(argv[8]));
    if (rv != MJ_OK) return 4;

    FILE *f = fopen(argv[9], "wb");
    if (!f) return 5;
    dump_side(f, cd.image_ncomponents, cd.image);
    dump_side(f, cd.alpha_ncomponents, cd.alpha);
    fclose(f);
    mj_free_compileddropon(&cd);
    mj_free_dropon(&d);
    return 0;
}
