"""AV1 in-loop filters: deblocking (spec 7.14); CDEF (7.15) and loop
restoration (7.17) live in av1_cdef.py / av1_lr.py.

Staged implementation validated against dav1d's inloop_filters mask
(tools/dav1d_oracle.py): each stage can be compared independently
(mask 1 = deblock, 2 = CDEF, 4 = restoration).  The C reference
(junka/ffpic) has no AV1 decode layer (format/avif.c:382-405 stub).

Correctness-first scalar formulation; the frame-level two-pass
structure (all vertical edges of a plane, then all horizontal) is
already the vectorization-friendly shape for the batched TPU path.
"""

from __future__ import annotations

import numpy as np

MAX_LOOP_FILTER = 63
SEG_LVL_ALT_LF_Y_V = 1  # + level-class offset (spec SEG_LVL ids 1-4)
INTRA_FRAME = 0


def apply_loop_filters(fs, planes, stages=7):
    """Apply deblock -> CDEF -> loop restoration in spec order.

    stages: bitmask matching dav1d's inloop_filters enum
    (1 = deblock, 2 = CDEF, 4 = restoration) so differential tests can
    pin each stage independently."""
    if stages & 1:
        planes = deblock_frame(fs, planes)
    deblocked = planes    # pre-CDEF frame: LR stripe-boundary source
    if stages & 2:
        from ffpic_tpu.formats.av1_cdef import cdef_frame
        planes = cdef_frame(fs, planes)
    if stages & 4:
        from ffpic_tpu.formats.av1_lr import lr_frame
        planes = lr_frame(fs, planes, deblocked)
    return planes


# ------------------------------------------------------------- deblock
def _filter_level(fs, plane, pass_, r, c):
    """Spec 7.14.4 per-position filter level (intra-frame subset:
    ref frame is always INTRA_FRAME, so no mode deltas apply)."""
    fh = fs.fh
    i = pass_ if plane == 0 else plane + 1
    lvl = fh.loop_filter_level[i]
    if fh.delta_lf_present:
        lvl = fh.loop_filter_level[i] + int(
            fs.delta_lf[r, c, i if fh.delta_lf_multi else 0])
        lvl = max(0, min(MAX_LOOP_FILTER, lvl))
    if fh.segmentation_enabled:
        seg = int(fs.seg[r, c])
        feat = SEG_LVL_ALT_LF_Y_V + i
        if fh.feature_enabled[seg][feat]:
            lvl = max(0, min(MAX_LOOP_FILTER,
                             lvl + fh.feature_data[seg][feat]))
    if fh.loop_filter_delta_enabled:
        lvl += fh.loop_filter_ref_deltas[INTRA_FRAME] << (lvl >> 5)
        lvl = max(0, min(MAX_LOOP_FILTER, lvl))
    return lvl


def _thresholds(lvl, sharpness, bd):
    shift = 2 if sharpness > 4 else (1 if sharpness > 0 else 0)
    if sharpness > 0:
        limit = max(1, min(9 - sharpness, lvl >> shift))
    else:
        limit = max(1, lvl)
    blimit = 2 * (lvl + 2) + limit
    thresh = lvl >> 4
    sc = 1 << (bd - 8)
    return limit * sc, blimit * sc, thresh * sc


def _clip1(v, bd):
    m = (1 << bd) - 1
    return 0 if v < 0 else (m if v > m else v)


def _filter_edge(seg, limit, blimit, thresh, wd, bd):
    """One edge position: seg = [p_{n-1}..p0, q0..q_{n-1}] with
    n = wd's sample reach (7 for wd16, wd//2 otherwise... callers pass
    exactly the reach).  Returns filtered seg or None if masked off.
    Mirrors the normative filter structure (spec 7.14.6)."""
    n = len(seg) // 2
    ps = seg[:n][::-1]          # ps[0] = p0 (nearest the edge)
    qs = seg[n:]
    p0, p1 = ps[0], ps[1]
    q0, q1 = qs[0], qs[1]
    fm = (abs(p1 - p0) <= limit and abs(q1 - q0) <= limit and
          abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1) <= blimit)
    if wd > 4:
        fm = fm and abs(ps[2] - p1) <= limit and \
            abs(qs[2] - q1) <= limit
        if wd > 6:
            fm = fm and abs(ps[3] - ps[2]) <= limit and \
                abs(qs[3] - qs[2]) <= limit
    if not fm:
        return None
    F = 1 << (bd - 8)
    out_p = list(ps)
    out_q = list(qs)
    flat_in = False
    if wd >= 6:
        flat_in = (abs(p1 - p0) <= F and abs(q1 - q0) <= F and
                   abs(ps[2] - p0) <= F and abs(qs[2] - q0) <= F)
        if wd >= 8:
            flat_in = flat_in and abs(ps[3] - p0) <= F and \
                abs(qs[3] - q0) <= F
    if wd >= 16 and flat_in:
        flat_out = all(abs(ps[j] - p0) <= F and abs(qs[j] - q0) <= F
                       for j in range(4, 7))
        if flat_out:
            p6, p5, p4, p3, p2 = ps[6], ps[5], ps[4], ps[3], ps[2]
            q2, q3, q4, q5, q6 = qs[2], qs[3], qs[4], qs[5], qs[6]
            out_p[5] = (p6 * 7 + p5 * 2 + p4 * 2 + p3 + p2 + p1 +
                        p0 + q0 + 8) >> 4
            out_p[4] = (p6 * 5 + p5 * 2 + p4 * 2 + p3 * 2 + p2 + p1 +
                        p0 + q0 + q1 + 8) >> 4
            out_p[3] = (p6 * 4 + p5 + p4 * 2 + p3 * 2 + p2 * 2 + p1 +
                        p0 + q0 + q1 + q2 + 8) >> 4
            out_p[2] = (p6 * 3 + p5 + p4 + p3 * 2 + p2 * 2 + p1 * 2 +
                        p0 + q0 + q1 + q2 + q3 + 8) >> 4
            out_p[1] = (p6 * 2 + p5 + p4 + p3 + p2 * 2 + p1 * 2 +
                        p0 * 2 + q0 + q1 + q2 + q3 + q4 + 8) >> 4
            out_p[0] = (p6 + p5 + p4 + p3 + p2 + p1 * 2 + p0 * 2 +
                        q0 * 2 + q1 + q2 + q3 + q4 + q5 + 8) >> 4
            out_q[0] = (p5 + p4 + p3 + p2 + p1 + p0 * 2 + q0 * 2 +
                        q1 * 2 + q2 + q3 + q4 + q5 + q6 + 8) >> 4
            out_q[1] = (p4 + p3 + p2 + p1 + p0 + q0 * 2 + q1 * 2 +
                        q2 * 2 + q3 + q4 + q5 + q6 * 2 + 8) >> 4
            out_q[2] = (p3 + p2 + p1 + p0 + q0 + q1 * 2 + q2 * 2 +
                        q3 * 2 + q4 + q5 + q6 * 3 + 8) >> 4
            out_q[3] = (p2 + p1 + p0 + q0 + q1 + q2 * 2 + q3 * 2 +
                        q4 * 2 + q5 + q6 * 4 + 8) >> 4
            out_q[4] = (p1 + p0 + q0 + q1 + q2 + q3 * 2 + q4 * 2 +
                        q5 * 2 + q6 * 5 + 8) >> 4
            out_q[5] = (p0 + q0 + q1 + q2 + q3 + q4 * 2 + q5 * 2 +
                        q6 * 7 + 8) >> 4
            return out_p[::-1] + out_q
    if wd >= 8 and flat_in:
        p3, p2 = ps[3], ps[2]
        q2, q3 = qs[2], qs[3]
        out_p[2] = (p3 * 3 + p2 * 2 + p1 + p0 + q0 + 4) >> 3
        out_p[1] = (p3 * 2 + p2 + p1 * 2 + p0 + q0 + q1 + 4) >> 3
        out_p[0] = (p3 + p2 + p1 + p0 * 2 + q0 + q1 + q2 + 4) >> 3
        out_q[0] = (p2 + p1 + p0 + q0 * 2 + q1 + q2 + q3 + 4) >> 3
        out_q[1] = (p1 + p0 + q0 + q1 * 2 + q2 + q3 * 2 + 4) >> 3
        out_q[2] = (p0 + q0 + q1 + q2 * 2 + q3 * 3 + 4) >> 3
        return out_p[::-1] + out_q
    if wd == 6 and flat_in:
        p2, q2 = ps[2], qs[2]
        out_p[1] = (p2 * 3 + p1 * 2 + p0 * 2 + q0 + 4) >> 3
        out_p[0] = (p2 + p1 * 2 + p0 * 2 + q0 * 2 + q1 + 4) >> 3
        out_q[0] = (p1 + p0 * 2 + q0 * 2 + q1 * 2 + q2 + 4) >> 3
        out_q[1] = (p0 + q0 * 2 + q1 * 2 + q2 * 3 + 4) >> 3
        return out_p[::-1] + out_q
    # narrow filter (filter4) with high-edge-variance check
    hev = abs(p1 - p0) > thresh or abs(q1 - q0) > thresh
    lo = -128 * F
    hi = 128 * F - 1

    def cd(x):
        return lo if x < lo else (hi if x > hi else x)
    if hev:
        f = cd(p1 - q1)
        f = cd(f + 3 * (q0 - p0))
        f1 = cd(f + 4) >> 3
        f2 = cd(f + 3) >> 3
        out_p[0] = _clip1(p0 + f2, bd)
        out_q[0] = _clip1(q0 - f1, bd)
    else:
        f = cd(3 * (q0 - p0))
        f1 = cd(f + 4) >> 3
        f2 = cd(f + 3) >> 3
        out_p[0] = _clip1(p0 + f2, bd)
        out_q[0] = _clip1(q0 - f1, bd)
        f3 = (f1 + 1) >> 1
        out_p[1] = _clip1(p1 + f3, bd)
        out_q[1] = _clip1(q1 - f3, bd)
    return out_p[::-1] + out_q


def deblock_frame(fs, planes):
    fh, seq = fs.fh, fs.seq
    if fh.coded_lossless or fh.allow_intrabc:
        return planes
    if not any(fh.loop_filter_level):
        return planes
    bd = seq.bit_depth
    sharp = fh.loop_filter_sharpness
    dt = planes[0].dtype
    out = [p.astype(np.int32, copy=True) for p in planes]
    for plane in range(len(planes)):
        if plane == 1 and not fh.loop_filter_level[2]:
            continue
        if plane == 2 and not fh.loop_filter_level[3]:
            continue
        if plane == 0 and not (fh.loop_filter_level[0] or
                               fh.loop_filter_level[1]):
            continue
        sx = seq.subsampling_x if plane else 0
        sy = seq.subsampling_y if plane else 0
        # NB: no per-pass luma gate on loop_filter_level[pass]: a zero
        # base level can still yield nonzero edge levels via
        # ref/mode/segment/delta-lf adjustments (spec 7.14.4 — only
        # the both-levels-zero plane gate above is normative).
        for pass_ in (0, 1):
            _deblock_pass(fs, out[plane], plane, pass_, sx, sy, bd,
                          sharp)
    return [p.astype(dt) for p in out]


def _deblock_pass(fs, arr, plane, pass_, sx, sy, bd, sharp):
    """pass_ 0: vertical edges (filter across columns);
    pass_ 1: horizontal edges."""
    h, w = arr.shape
    n4c = w >> 2
    n4r = h >> 2
    txw = fs.tx_w4[0 if plane == 0 else 1]
    txh = fs.tx_h4[0 if plane == 0 else 1]
    b_col0, b_row0 = fs.b_col0, fs.b_row0
    skip = fs.skip
    mi_rows, mi_cols = fs.mi_rows, fs.mi_cols
    for r4 in range(n4r):
        for c4 in range(n4c):
            if (c4 == 0 and pass_ == 0) or (r4 == 0 and pass_ == 1):
                continue
            # mi coords of this plane position (chroma reads the
            # bottom-right mi of its pair, spec 7.14.5)
            mr = min((r4 << sy) | sy, mi_rows - 1)
            mc = min((c4 << sx) | sx, mi_cols - 1)
            if pass_ == 0:
                pmr = mr
                pmc = min(((c4 - 1) << sx) | sx, mi_cols - 1)
                tcur = int(txw[mr, mc])
                tprev = int(txw[pmr, pmc])
                if c4 % tcur:
                    continue            # not a tx edge
                is_block_edge = (int(b_col0[mr, mc]) >> sx) == c4
            else:
                pmr = min(((r4 - 1) << sy) | sy, mi_rows - 1)
                pmc = mc
                tcur = int(txh[mr, mc])
                tprev = int(txh[pmr, pmc])
                if r4 % tcur:
                    continue
                is_block_edge = (int(b_row0[mr, mc]) >> sy) == r4
            if not (is_block_edge or not skip[mr, mc] or
                    not skip[pmr, pmc]):
                continue
            lvl = _filter_level(fs, plane, pass_, mr, mc)
            if lvl == 0:
                lvl = _filter_level(fs, plane, pass_, pmr, pmc)
            if lvl == 0:
                continue
            m = min(tcur, tprev)
            if plane == 0:
                wd = 16 if m >= 4 else (8 if m >= 2 else 4)
            else:
                wd = 6 if m >= 2 else 4
            reach = 7 if wd == 16 else (wd >> 1)
            limit, blimit, thresh = _thresholds(lvl, sharp, bd)
            if pass_ == 0:
                x = c4 * 4
                for y in range(r4 * 4, r4 * 4 + 4):
                    seg = [int(arr[y, x - reach + k])
                           for k in range(2 * reach)]
                    res = _filter_edge(seg, limit, blimit, thresh,
                                       wd, bd)
                    if res is not None:
                        for k in range(2 * reach):
                            arr[y, x - reach + k] = res[k]
            else:
                y = r4 * 4
                for x in range(c4 * 4, c4 * 4 + 4):
                    seg = [int(arr[y - reach + k, x])
                           for k in range(2 * reach)]
                    res = _filter_edge(seg, limit, blimit, thresh,
                                       wd, bd)
                    if res is not None:
                        for k in range(2 * reach):
                            arr[y - reach + k, x] = res[k]
