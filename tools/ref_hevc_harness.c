/* Conformance oracle harness: feed length-prefixed HEVC NALUs through
 * the reference decoder (parse_nalu) and dump its BGRA output.
 * Usage: ref_hevc_harness <nalus.bin> <width> <height> <out.bgra>
 * Width/height must be CTB-aligned (pitch = ((w+3)>>2)<<2 * 4). */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include "hevc.h"

int main(int argc, char **argv) {
    if (argc != 5) return 2;
    FILE *f = fopen(argv[1], "rb");
    if (!f) return 3;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *data = malloc(n);
    if (fread(data, 1, n, f) != (size_t)n) return 4;
    fclose(f);
    int w = atoi(argv[2]), h = atoi(argv[3]);
    int y_stride = ((w + 3) >> 2) << 2;
    int pitch = ((y_stride * 32 + 31) >> 5) << 2;
    int hpad = ((h + 3) >> 2) << 2;
    uint8_t *pixels = calloc((size_t)pitch * (hpad + 64), 1);
    struct hevc_param_set hps;
    memset(&hps, 0, sizeof(hps));
    uint8_t *p = data;
    long left = n;
    while (left > 4) {
        uint32_t ln = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
        p += 4; left -= 4;
        if ((long)ln > left) break;
        parse_nalu(p, ln, &pixels, &hps);
        p += ln; left -= ln;
    }
    FILE *o = fopen(argv[4], "wb");
    fwrite(pixels, 1, (size_t)pitch * hpad, o);
    fclose(o);
    return 0;
}
