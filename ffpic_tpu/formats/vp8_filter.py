"""VP8 in-loop deblocking filters (RFC 6386 section 15).

Parity with the reference's simple + normal filters and per-segment
strength precompute (format/webp.c:1685-1803). Edge math is vectorized
across the edge (all rows/columns of an MB edge at once); the MB loop
preserves the spec's raster filtering order. Pixel math runs in the
spec's signed domain (x - 128) with int8-style clamps.
"""

from __future__ import annotations

import numpy as np

B_PRED = 4


def _c(x):
    """signed-char clamp (RFC 6386 'c()')"""
    return np.clip(x, -128, 127)


def _u(plane_vals):
    """u8 -> signed domain"""
    return plane_vals.astype(np.int32) - 128


def _s2u(x):
    return (_c(x) + 128).astype(np.uint8)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC 15.3 common_adjust; returns the 'a' (F1) value and updates
    p0/q0 in place semantics via returned arrays."""
    a = _c(_c(p1 - q1) * use_outer + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    q0n = _c(q0 - f1)
    p0n = _c(p0 + f2)
    return f1, p0n, q0n


def _simple_filter(p1, p0, q0, q1, flimit):
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= flimit
    f1, p0n, q0n = _common_adjust(1, p1, p0, q0, q1)
    return np.where(mask, p0n, p0), np.where(mask, q0n, q0)


def _filter_mask(limit, ilimit, p3, p2, p1, p0, q0, q1, q2, q3):
    m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    for a, b in ((p3, p2), (p2, p1), (p1, p0), (q1, q0), (q2, q1),
                 (q3, q2)):
        m &= np.abs(a - b) <= ilimit
    return m


def _hev(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _subblock_filter(mask, hev, p1, p0, q0, q1):
    """RFC 15.3 subblock_filter (normal filter, interior edges)."""
    f1, p0h, q0h = _common_adjust(1, p1, p0, q0, q1)      # hev path
    f1n, p0n, q0n = _common_adjust(0, p1, p0, q0, q1)     # !hev path
    a3 = (f1n + 1) >> 1
    p1n = _c(p1 + a3)
    q1n = _c(q1 - a3)
    use_h = mask & hev
    use_n = mask & ~hev
    p0o = np.where(use_h, p0h, np.where(use_n, p0n, p0))
    q0o = np.where(use_h, q0h, np.where(use_n, q0n, q0))
    p1o = np.where(use_n, p1n, p1)
    q1o = np.where(use_n, q1n, q1)
    return p1o, p0o, q0o, q1o


def _mb_filter(mask, hev, p2, p1, p0, q0, q1, q2):
    """RFC 15.3 mbfilter (normal filter, MB edges)."""
    _, p0h, q0h = _common_adjust(1, p1, p0, q0, q1)
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    p0n, q0n = _c(p0 + a), _c(q0 - a)
    a = _c((18 * w + 63) >> 7)
    p1n, q1n = _c(p1 + a), _c(q1 - a)
    a = _c((9 * w + 63) >> 7)
    p2n, q2n = _c(p2 + a), _c(q2 - a)
    use_h = mask & hev
    use_n = mask & ~hev
    p0o = np.where(use_h, p0h, np.where(use_n, p0n, p0))
    q0o = np.where(use_h, q0h, np.where(use_n, q0n, q0))
    p1o = np.where(use_n, p1n, p1)
    q1o = np.where(use_n, q1n, q1)
    p2o = np.where(use_n, p2n, p2)
    q2o = np.where(use_n, q2n, q2)
    return p2o, p1o, p0o, q0o, q1o, q2o


class _Edge:
    """Signed-domain view of the 8 pixel lanes across one edge."""

    def __init__(self, plane, horiz, pos, lo, hi):
        # horiz: filtering a horizontal edge (pixels vary along y)
        self.plane = plane
        self.horiz = horiz
        self.pos = pos
        self.sl = slice(lo, hi)

    def get(self, k):
        """pixel at signed offset k from the edge (k=-1 -> p0, 0 -> q0)"""
        if self.horiz:
            return _u(self.plane[self.pos + k, self.sl])
        return _u(self.plane[self.sl, self.pos + k])

    def set(self, k, vals):
        if self.horiz:
            self.plane[self.pos + k, self.sl] = _s2u(vals)
        else:
            self.plane[self.sl, self.pos + k] = _s2u(vals)


def _filter_levels(dec):
    """Per-MB loop-filter level (RFC 6386 15.3), vectorized."""
    h = dec.hdr
    if h.seg_enabled:
        seg_lf = np.asarray(h.seg_lf, np.int32)[dec.seg]
        lvl = seg_lf if h.seg_abs else h.filter_level + seg_lf
    else:
        lvl = np.full((dec.mbh, dec.mbw), h.filter_level, np.int32)
    lvl = np.clip(lvl, 0, 63)
    if h.lf_delta_enabled:
        lvl = lvl + h.ref_lf_deltas[0]             # intra frame
        lvl = np.where(dec.ymode == B_PRED,
                       lvl + h.mode_lf_deltas[0], lvl)
        lvl = np.clip(lvl, 0, 63)
    return lvl.astype(np.int32)


def loop_filter_frame(dec, force_python: bool = False) -> None:
    h = dec.hdr
    if h.filter_level == 0:
        return
    levels = _filter_levels(dec)
    simple = h.filter_type == 1
    Y, U, V = dec.Y, dec.U, dec.V

    if not force_python:
        import os
        if not os.environ.get("FFPIC_NO_NATIVE"):
            from ffpic_tpu import native
            if native.available():
                inner = (dec.mb_has_coeffs.astype(bool)
                         | (dec.ymode == B_PRED)).astype(np.uint8)
                native.vp8_loop_filter(Y, U, V, levels, inner,
                                       simple, h.sharpness)
                return

    for my in range(dec.mbh):
        for mx in range(dec.mbw):
            level = int(levels[my, mx])
            if level == 0:
                continue
            ilevel = level
            if h.sharpness > 0:
                ilevel >>= 2 if h.sharpness > 4 else 1
                ilevel = min(ilevel, 9 - h.sharpness)
            ilevel = max(ilevel, 1)
            mb_limit = (level + 2) * 2 + ilevel
            sub_limit = level * 2 + ilevel
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            # inner edges filter only if the MB has actual coefficients
            # or is B_PRED (RFC 15.2; libwebp recomputes skip from nz)
            inner = bool(dec.mb_has_coeffs[my, mx]) or \
                dec.ymode[my, mx] == B_PRED

            y0, x0 = my * 16, mx * 16
            if simple:
                self_edges = []
                if mx > 0:
                    self_edges.append((False, x0, mb_limit))
                if inner:
                    self_edges += [(False, x0 + d, sub_limit)
                                   for d in (4, 8, 12)]
                if my > 0:
                    self_edges.append((True, y0, mb_limit))
                if inner:
                    self_edges += [(True, y0 + d, sub_limit)
                                   for d in (4, 8, 12)]
                # spec order: all vertical first, then horizontal
                for horiz, pos, lim in self_edges:
                    e = _Edge(Y, horiz, pos,
                              y0 if not horiz else x0,
                              (y0 if not horiz else x0) + 16)
                    p1, p0 = e.get(-2), e.get(-1)
                    q0, q1 = e.get(0), e.get(1)
                    p0n, q0n = _simple_filter(p1, p0, q0, q1, lim)
                    e.set(-1, p0n)
                    e.set(0, q0n)
                continue

            # normal filter: luma then both chroma planes
            def run(plane, base_y, base_x, size, edges):
                for horiz, pos, lim, is_mb in edges:
                    lo = base_y if not horiz else base_x
                    e = _Edge(plane, horiz, pos, lo, lo + size)
                    p = [e.get(k) for k in range(-4, 4)]
                    mask = _filter_mask(lim, ilevel, *p)
                    hv = _hev(hev_t, p[2], p[3], p[4], p[5])
                    if is_mb:
                        out = _mb_filter(mask, hv, p[1], p[2], p[3],
                                         p[4], p[5], p[6])
                        for k, v in zip(range(-3, 3), out):
                            e.set(k, v)
                    else:
                        out = _subblock_filter(mask, hv, p[2], p[3],
                                               p[4], p[5])
                        for k, v in zip(range(-2, 2), out):
                            e.set(k, v)

            yedges = []
            if mx > 0:
                yedges.append((False, x0, mb_limit, True))
            if inner:
                yedges += [(False, x0 + d, sub_limit, False)
                           for d in (4, 8, 12)]
            if my > 0:
                yedges.append((True, y0, mb_limit, True))
            if inner:
                yedges += [(True, y0 + d, sub_limit, False)
                           for d in (4, 8, 12)]
            run(Y, y0, x0, 16, yedges)

            cy, cx = my * 8, mx * 8
            cedges = []
            if mx > 0:
                cedges.append((False, cx, mb_limit, True))
            if inner:
                cedges.append((False, cx + 4, sub_limit, False))
            if my > 0:
                cedges.append((True, cy, mb_limit, True))
            if inner:
                cedges.append((True, cy + 4, sub_limit, False))
            run(U, cy, cx, 8, cedges)
            run(V, cy, cx, 8, cedges)
