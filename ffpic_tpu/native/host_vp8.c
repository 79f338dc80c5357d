/* host_vp8.c — native VP8 in-loop deblocking filter (RFC 6386 §15).
 *
 * The loop filter has a strict raster serial dependency (each MB's
 * edges read pixels written by the previous MB's filtering — see
 * formats/vp8_filter.py), so it cannot batch onto the device the way
 * the residual/IDCT stage does; this is the host-side native kernel
 * for it, replacing the vectorized-numpy fallback (~250x faster on
 * the 1-vCPU TPU VM).  Semantics are an exact port of
 * formats/vp8_filter.py (itself pixel-exact vs libwebp); the
 * differential test drives both on identical frames.
 *
 * Reference scope anchor: format/webp.c:1685-1803.
 */

#include <stdint.h>
#include <stdlib.h>

#define FFPIC_API __attribute__((visibility("default")))

static inline int c8(int x) { return x < -128 ? -128 : (x > 127 ? 127 : x); }
static inline int iabs(int x) { return x < 0 ? -x : x; }

/* lane accessor: edge at `base`, lanes advance by ls, across-edge
 * offset k advances by ks (k = 0 is q0, k = -1 is p0) */
#define PIX(l, k) ((int)base[(l) * ls + (k) * ks] - 128)
#define PUT(l, k, v) (base[(l) * ls + (k) * ks] = (uint8_t)(c8(v) + 128))

static void simple_edge(uint8_t *base, long ls, long ks, int lanes,
                        int flimit) {
    for (int l = 0; l < lanes; l++) {
        int p1 = PIX(l, -2), p0 = PIX(l, -1);
        int q0 = PIX(l, 0), q1 = PIX(l, 1);
        if (iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1) > flimit)
            continue;
        int a = c8(c8(p1 - q1) + 3 * (q0 - p0));
        int f1 = c8(a + 4) >> 3;
        int f2 = c8(a + 3) >> 3;
        PUT(l, 0, q0 - f1);
        PUT(l, -1, p0 + f2);
    }
}

static void normal_edge(uint8_t *base, long ls, long ks, int lanes,
                        int lim, int ilim, int hev_t, int is_mb) {
    for (int l = 0; l < lanes; l++) {
        int p3 = PIX(l, -4), p2 = PIX(l, -3), p1 = PIX(l, -2),
            p0 = PIX(l, -1);
        int q0 = PIX(l, 0), q1 = PIX(l, 1), q2 = PIX(l, 2),
            q3 = PIX(l, 3);
        int mask = (iabs(p0 - q0) * 2 + (iabs(p1 - q1) >> 1)) <= lim
            && iabs(p3 - p2) <= ilim && iabs(p2 - p1) <= ilim
            && iabs(p1 - p0) <= ilim && iabs(q1 - q0) <= ilim
            && iabs(q2 - q1) <= ilim && iabs(q3 - q2) <= ilim;
        if (!mask)
            continue;
        int hev = iabs(p1 - p0) > hev_t || iabs(q1 - q0) > hev_t;
        if (hev) {
            /* common_adjust(use_outer=1): filter p0/q0 only */
            int a = c8(c8(p1 - q1) + 3 * (q0 - p0));
            int f1 = c8(a + 4) >> 3;
            int f2 = c8(a + 3) >> 3;
            PUT(l, 0, q0 - f1);
            PUT(l, -1, p0 + f2);
        } else if (is_mb) {
            int w = c8(c8(p1 - q1) + 3 * (q0 - p0));
            int a = c8((27 * w + 63) >> 7);
            PUT(l, -1, p0 + a);
            PUT(l, 0, q0 - a);
            a = c8((18 * w + 63) >> 7);
            PUT(l, -2, p1 + a);
            PUT(l, 1, q1 - a);
            a = c8((9 * w + 63) >> 7);
            PUT(l, -3, p2 + a);
            PUT(l, 2, q2 - a);
        } else {
            /* common_adjust(use_outer=0) + p1/q1 nudge */
            int a = c8(3 * (q0 - p0));
            int f1 = c8(a + 4) >> 3;
            int f2 = c8(a + 3) >> 3;
            int a3 = (f1 + 1) >> 1;
            PUT(l, 0, q0 - f1);
            PUT(l, -1, p0 + f2);
            PUT(l, -2, p1 + a3);
            PUT(l, 1, q1 - a3);
        }
    }
}

/* Filter one whole frame.  levels/inner are (mbh*mbw) row-major. */
FFPIC_API void ffpic_vp8_loop_filter(
    uint8_t *Y, uint8_t *U, uint8_t *V, int mbh, int mbw,
    const int32_t *levels, const uint8_t *inner_flags,
    int simple, int sharpness) {
    long ys = (long)mbw * 16;     /* luma stride */
    long cs = (long)mbw * 8;      /* chroma stride */
    for (int my = 0; my < mbh; my++) {
        for (int mx = 0; mx < mbw; mx++) {
            int level = levels[my * mbw + mx];
            if (level == 0)
                continue;
            int ilevel = level;
            if (sharpness > 0) {
                ilevel >>= (sharpness > 4) ? 2 : 1;
                if (ilevel > 9 - sharpness)
                    ilevel = 9 - sharpness;
            }
            if (ilevel < 1)
                ilevel = 1;
            int mb_lim = (level + 2) * 2 + ilevel;
            int sub_lim = level * 2 + ilevel;
            int hev_t = level >= 40 ? 2 : (level >= 15 ? 1 : 0);
            int inner = inner_flags[my * mbw + mx];
            long y0 = (long)my * 16, x0 = (long)mx * 16;

            if (simple) {
                /* vertical edges (lanes along y), then horizontal */
                if (mx > 0)
                    simple_edge(Y + y0 * ys + x0, ys, 1, 16, mb_lim);
                if (inner)
                    for (int d = 4; d <= 12; d += 4)
                        simple_edge(Y + y0 * ys + x0 + d, ys, 1, 16,
                                    sub_lim);
                if (my > 0)
                    simple_edge(Y + y0 * ys + x0, 1, ys, 16, mb_lim);
                if (inner)
                    for (int d = 4; d <= 12; d += 4)
                        simple_edge(Y + (y0 + d) * ys + x0, 1, ys, 16,
                                    sub_lim);
                continue;
            }

            /* normal: luma */
            if (mx > 0)
                normal_edge(Y + y0 * ys + x0, ys, 1, 16, mb_lim,
                            ilevel, hev_t, 1);
            if (inner)
                for (int d = 4; d <= 12; d += 4)
                    normal_edge(Y + y0 * ys + x0 + d, ys, 1, 16,
                                sub_lim, ilevel, hev_t, 0);
            if (my > 0)
                normal_edge(Y + y0 * ys + x0, 1, ys, 16, mb_lim,
                            ilevel, hev_t, 1);
            if (inner)
                for (int d = 4; d <= 12; d += 4)
                    normal_edge(Y + (y0 + d) * ys + x0, 1, ys, 16,
                                sub_lim, ilevel, hev_t, 0);

            /* chroma */
            long cy = (long)my * 8, cx = (long)mx * 8;
            uint8_t *planes[2] = {U, V};
            for (int pi = 0; pi < 2; pi++) {
                uint8_t *P = planes[pi];
                if (mx > 0)
                    normal_edge(P + cy * cs + cx, cs, 1, 8, mb_lim,
                                ilevel, hev_t, 1);
                if (inner)
                    normal_edge(P + cy * cs + cx + 4, cs, 1, 8,
                                sub_lim, ilevel, hev_t, 0);
                if (my > 0)
                    normal_edge(P + cy * cs + cx, 1, cs, 8, mb_lim,
                                ilevel, hev_t, 1);
                if (inner)
                    normal_edge(P + (cy + 4) * cs + cx, 1, cs, 8,
                                sub_lim, ilevel, hev_t, 0);
            }
        }
    }
}
