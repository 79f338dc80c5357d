"""Machine-extract the AV1 motion-compensation constant tables
(normative spec constants) from the system libaom binary, cross-
validated against the dav1d builds on this box — same methodology as
tools/extract_av1_cdfs.py (no AV1 source ships in this image; these
are thousands of normative constants that must be exact).

Tables and how they are found (structural fingerprints, no fixed
addresses needed):

- Subpel_Filters[6][16][8] (spec 7.11.3.4 "af"): six interpolation
  filter sets (REGULAR, SMOOTH, SHARP, BILINEAR, REGULAR_4,
  SMOOTH_4), 16 phases x 8 int16 taps, every row sums to 128 and
  phase 0 is [0,0,0,128,0,0,0,0].  libaom stores each set as a
  16x8 int16 block; we scan for such blocks and classify by tap
  structure (bilinear: 2 nonzero taps; 4-tap: zeros at 0,1,6,7).
- Warped_Filters[193][8] (spec 7.11.3.5): 193 rows of 8 int16 taps
  summing to 128, rows ordered by fractional offset; found as the
  unique 193-row sum-128 run.
- Obmc_Mask_2/4/8/16/32 (spec 7.11.3.10): uint8 blending masks,
  values <= 64, each ending in 64; located as one contiguous
  2+4+8+16+32 run (libaom keeps them adjacent).
- Wedge_Master_Oblique_Odd/Even, Wedge_Master_Vertical (spec
  7.11.3.11): uint8 rows with the distinctive 0->64 soft ramp
  [..., 2, 6, 18, 37, 53, 60, 63, 64, ...].
- Ii_Weights_1d (spec 7.11.3.13 smooth interintra): uint8 decay
  table starting 60.
- Div_Lut[257] (spec 7.11.3.7 warp shear): uint16 descending
  16384..8192.

Output: ffpic_tpu/coding/av1_mc_tables.py (generated, do not edit).
"""

from __future__ import annotations

import base64
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from extract_av1_cdfs import AOM, DAV1, _find_dav2  # noqa: E402


def _raws():
    return {"aom": open(AOM, "rb").read(),
            "dav1": open(DAV1, "rb").read(),
            "dav2": open(_find_dav2(), "rb").read()}


def find_filter_blocks(raw: bytes):
    """All offsets of 16x8 int16 rows that each sum to 128 with
    |tap| < 256 and phase-0 row == identity."""
    a = np.frombuffer(raw[:len(raw) // 2 * 2], "<i2")
    hits = []
    # phase-0 identity row, 16-bit aligned
    ident = np.array([0, 0, 0, 128, 0, 0, 0, 0], "<i2").tobytes()
    start = 0
    while True:
        off = raw.find(ident, start)
        if off < 0:
            break
        start = off + 2
        if off % 2:
            continue
        rows = a[off // 2: off // 2 + 16 * 8]
        if len(rows) < 128:
            continue
        rows = rows.reshape(16, 8)
        if (np.abs(rows) < 512).all() and \
                (rows.sum(axis=1) == 128).all() and \
                all((rows[p][::-1] == rows[16 - p]).all()
                    for p in range(1, 16)):
            # genuine interpolation sets are phase-complementary
            # (set[p] reversed == set[16-p]); this rejects resize /
            # scaling tables that also sum to 128
            hits.append((off, rows.copy()))
    return hits


def classify_filter(rows: np.ndarray) -> str:
    """Classify a 16x8 sum-128 block by tap support of phase 8."""
    mid = rows[8]
    nz = np.flatnonzero(mid != 0)
    if len(nz) == 2:
        return "bilinear"
    if nz.min() >= 2 and nz.max() <= 5:
        return "4tap"
    return "8tap"


def find_warp(raw: bytes):
    a = np.frombuffer(raw[:len(raw) // 2 * 2], "<i2")
    # phase row [0,0,0,128,...] occurs at WARPEDPIXEL_PREC_SHIFTS
    # boundaries too; instead scan for 193 consecutive sum-128 rows
    # libaom's av1_warped_filter[193][8]: first row (offset -64) is
    # the two-pixel split [0, 0, 127, 1, 0, 0, 0, 0]; every row sums
    # to 128
    best = []
    head = np.array([0, 0, 127, 1, 0, 0, 0, 0], "<i2").tobytes()
    start = 0
    while True:
        off = raw.find(head, start)
        if off < 0:
            break
        start = off + 2
        if off % 2:
            continue
        rows = a[off // 2: off // 2 + 193 * 8]
        if len(rows) < 193 * 8:
            continue
        rows = rows.reshape(193, 8)
        if (rows.sum(axis=1) == 128).all() and \
                (np.abs(rows.astype(np.int32)) < 4096).all():
            best.append((off, rows.copy()))
    return best


def find_u8_seq(raw: bytes, seq) -> list[int]:
    pat = bytes(seq)
    hits, start = [], 0
    while True:
        off = raw.find(pat, start)
        if off < 0:
            return hits
        hits.append(off)
        start = off + 1


def find_div_lut(raw: bytes):
    a = np.frombuffer(raw[:len(raw) // 2 * 2], "<u2")
    idx = np.flatnonzero(a == 16384)
    out = []
    for i in idx:
        t = a[i:i + 257]
        if len(t) == 257 and t[-1] == 8192 and \
                (np.diff(t.astype(np.int64)) <= 0).all() and \
                (np.diff(t.astype(np.int64)) >= -70).all():
            out.append((i * 2, t.copy()))
    return out


def main():
    raws = _raws()
    out = {}

    # ---- subpel filters ----
    blocks = {k: find_filter_blocks(r) for k, r in raws.items()}
    aom_blocks = blocks["aom"]
    print(f"libaom 16x8 sum-128 blocks: {len(aom_blocks)}")
    # cross-validate: keep blocks whose full byte payload appears in
    # at least one dav1d binary (dav1d stores int8 for MC filters, so
    # match against dav1d's int8 encoding as well)
    confirmed = []
    for off, rows in aom_blocks:
        pat16 = rows.astype("<i2").tobytes()
        pat8 = rows[1:].astype(np.int8).tobytes()  # dav1d drops ph0
        ok = sum(pat16 in raws[k] for k in ("dav1", "dav2"))
        ok8 = sum(pat8 in raws[k] for k in ("dav1", "dav2"))
        confirmed.append((off, rows, ok + ok8))
        print(f"  @{hex(off)} {classify_filter(rows)} conf16={ok} "
              f"conf8={ok8} ph8={rows[8].tolist()}")
    kinds = {}
    for off, rows, conf in confirmed:
        kinds.setdefault(classify_filter(rows), []).append(
            (off, rows, conf))
    # Expected: >=3 8-tap (regular, smooth, sharp), >=2 4-tap,
    # >=1 bilinear.  Identify by structure:
    #  - smooth: all taps >= 0 on phase 8 (low-pass)
    #  - sharp: phase-8 outer taps magnitude > regular's
    sets = {}
    for off, rows, conf in kinds.get("8tap", []):
        ph8 = rows[8]
        if ph8[0] != 0:                 # all 8 taps active
            sets.setdefault("sharp", (off, rows, conf))
        elif int(ph8[3]) <= 64:         # soft center (52)
            sets.setdefault("smooth", (off, rows, conf))
        else:                           # center 76
            sets.setdefault("regular", (off, rows, conf))
    for off, rows, conf in kinds.get("4tap", []):
        ph8 = rows[8]
        if (ph8 >= 0).all():
            sets.setdefault("smooth4", (off, rows, conf))
        else:
            sets.setdefault("regular4", (off, rows, conf))
    if kinds.get("bilinear"):
        sets["bilinear"] = kinds["bilinear"][0]
    missing = {"regular", "smooth", "sharp", "bilinear", "regular4",
               "smooth4"} - set(sets)
    if missing:
        print("FAIL: missing filter sets", missing, file=sys.stderr)
        return 1
    order = ["regular", "smooth", "sharp", "bilinear", "regular4",
             "smooth4"]
    subpel = np.stack([sets[k][1] for k in order])
    for k in order:
        if sets[k][2] < 1:
            print(f"FAIL: subpel set {k} unconfirmed by dav1d",
                  file=sys.stderr)
            return 1
    out["subpel_filters"] = subpel.astype(np.int16)

    # ---- warp filter ----
    warps = find_warp(raws["aom"])
    print(f"warp candidates: {[hex(o) for o, _ in warps]}")
    ok_w = []
    for off, rows in warps:
        pat = rows.astype("<i2").tobytes()
        c = sum(pat in raws[k] for k in ("dav1", "dav2"))
        c8 = sum(rows.astype(np.int8).tobytes() in raws[k]
                 for k in ("dav1", "dav2"))
        ok_w.append((off, rows, c + c8))
    ok_w = [w for w in ok_w if w[2] >= 1]
    if not ok_w:
        print("FAIL: warp filter not confirmed", file=sys.stderr)
        return 1
    out["warped_filters"] = ok_w[0][1].astype(np.int16)

    # ---- obmc masks ----
    # located via the distinctive 8-mask; libaom keeps the five masks
    # contiguous in DESCENDING size order (32, 16, 8, 4, 2), verified
    # on this box's libaom and dav1d builds (byte-identical 62-byte
    # runs)
    hits8 = find_u8_seq(raws["aom"], [36, 42, 48, 53, 57, 61, 64, 64])
    found = None
    for h in hits8:
        seg = raws["aom"][h - 48:h + 14]
        if len(seg) < 62:
            continue
        m32, m16 = list(seg[:32]), list(seg[32:48])
        m8, m4, m2 = list(seg[48:56]), list(seg[56:60]), \
            list(seg[60:62])
        masks = [m2, m4, m8, m16, m32]
        if all(m[-1] == 64 and all(0 < v <= 64 for v in m) and
               all(b <= a for a, b in zip(m[1:], m)) for m in masks):
            conf = sum(bytes(seg) in raws[k] for k in ("dav1", "dav2"))
            print(f"obmc masks @{hex(h-48)} conf={conf} m2={m2} "
                  f"m4={m4} m8={m8} m16={m16[:4]}.. m32={m32[:4]}..")
            if conf >= 1:
                found = (m2, m4, m8, m16, m32, conf)
                break
    if not found:
        print("FAIL: obmc masks not found", file=sys.stderr)
        return 1
    m2, m4, m8, m16, m32, conf = found
    obmc = np.zeros((5, 32), np.uint8)
    for i, m in enumerate([m2, m4, m8, m16, m32]):
        obmc[i, :len(m)] = m
    out["obmc_mask"] = obmc

    # ---- wedge master rows ----
    # dav1d stores the three 8-tap border ramps adjacently
    # (wedge_master_border[3][8]: ODD, EVEN, VERT); libaom stores the
    # full 64-byte rows for odd/even (28 zeros + ramp + 28 x 64) and
    # the central 32 bytes for vertical (13 zeros + 6-ramp + 13 x 64
    # == bytes 16..47 of the 64-row with 29 zeros).  Locate the
    # border block in a dav1d binary via its odd-ramp prefix with the
    # even ramp following, then synthesize + cross-validate vs libaom.
    border = None
    for k in ("dav1", "dav2"):
        raw = raws[k]
        s = 0
        while True:
            o = raw.find(bytes([2, 6, 18, 37, 53, 60, 63]), s)
            if o < 0:
                break
            s = o + 1
            blk = raw[o - 1:o + 23]
            if len(blk) == 24 and blk[0] == 1 and blk[8] == 1 and \
                    blk[15] == 63 and blk[16] == 0 and blk[23] == 64:
                border = (k, o - 1, np.frombuffer(blk, np.uint8)
                          .reshape(3, 8).copy())
                break
        if border:
            break
    if border is None:
        print("FAIL: wedge master border not found", file=sys.stderr)
        return 1
    kb, ob, b = border
    odd = np.concatenate([np.zeros(28, np.uint8), b[0],
                          np.full(28, 64, np.uint8)])
    even = np.concatenate([np.zeros(28, np.uint8), b[1],
                           np.full(28, 64, np.uint8)])
    vert = np.concatenate([np.zeros(28, np.uint8), b[2],
                           np.full(28, 64, np.uint8)])
    conf_o = odd.tobytes() in raws["aom"]
    conf_e = even.tobytes() in raws["aom"]
    conf_v = vert[16:48].tobytes() in raws["aom"]
    print(f"wedge border @{kb}:{hex(ob)} rows={b.tolist()} "
          f"aom-conf odd={conf_o} even={conf_e} vert32={conf_v}")
    if not (conf_o and conf_e and conf_v):
        print("FAIL: wedge master rows unconfirmed vs libaom",
              file=sys.stderr)
        return 1
    out["wedge_master_rows"] = np.stack([odd, even, vert])

    # ---- wedge codebooks ----
    # spec 7.11.3.11 Wedge_Codebook[3][16][3] (direction, x8, y8);
    # libaom stores each as 16 x 3 int32, dav1d as 16 x 3 u8, in
    # hltw/heqw/hgtw declaration order.  Anchor on the shared 4-entry
    # prefix {2,4,4},{3,4,4},{4,4,4},{5,4,4} as int32 in libaom and
    # collect the three distinct 16x3 tables, then classify:
    #   heqw: entries 4-7 = H(4,2) H(4,6) V(2,4) V(6,4)
    #   hltw: entries 4-7 = V(2,4) V(4,4) V(6,4) H(4,4)
    #   hgtw: entries 4-7 = H(4,2) H(4,4) H(4,6) V(4,4)
    pref = np.array([2, 4, 4, 3, 4, 4, 4, 4, 4, 5, 4, 4],
                    "<i4").tobytes()
    books = {}
    s = 0
    while True:
        o = raws["aom"].find(pref, s)
        if o < 0:
            break
        s = o + 4
        tab = np.frombuffer(raws["aom"][o:o + 192], "<i4")
        if len(tab) < 48:
            continue
        tab = tab.reshape(16, 3)
        if not ((tab[:, 0] <= 5).all() and (tab[:, 0] >= 0).all() and
                np.isin(tab[:, 1:], [2, 4, 6]).all()):
            continue
        mid = tuple(tab[4:8, 0].tolist())
        name = {(0, 0, 1, 1): "heqw", (1, 1, 1, 0): "hltw",
                (0, 0, 0, 1): "hgtw"}.get(mid)
        if name:
            # cross-validate against a dav1d u8 copy
            c8 = sum(tab.astype(np.uint8).tobytes() in raws[k]
                     for k in ("dav1", "dav2"))
            print(f"codebook {name} @{hex(o)} dav1d-conf={c8}")
            if c8 >= 1:
                books[name] = tab
    if set(books) != {"heqw", "hltw", "hgtw"}:
        print("FAIL: wedge codebooks incomplete", set(books),
              file=sys.stderr)
        return 1
    out["wedge_codebook"] = np.stack(
        [books["hltw"], books["heqw"], books["hgtw"]]).astype(np.int8)

    # ---- distance-weighted compound tables (spec 7.11.3.15) ----
    # Quant_Dist_Lookup[4][2] and Quant_Dist_Weight[4][2], stored as
    # adjacent int32 in libaom
    qd = np.array([9, 7, 11, 5, 12, 4, 13, 3], "<i4").tobytes()
    oq = raws["aom"].find(qd)
    if oq < 0:
        print("FAIL: quant_dist_lookup not found", file=sys.stderr)
        return 1
    qw = np.frombuffer(raws["aom"][oq + 32:oq + 64], "<i4")
    if qw.tolist() != [2, 3, 2, 5, 2, 7, 1, 31]:
        print("FAIL: quant_dist_weight mismatch", qw.tolist(),
              file=sys.stderr)
        return 1
    print(f"quant_dist tables @{hex(oq)}")
    out["quant_dist_lookup"] = np.array(
        [[9, 7], [11, 5], [12, 4], [13, 3]], np.int16)
    out["quant_dist_weight"] = np.array(
        [[2, 3], [2, 5], [2, 7], [1, 31]], np.int16)

    # ---- Div_Mult[32] (spec 7.9.3 motion field projection) ----
    # Div_Mult[d] = 16384 / d (integer), d=1..31; locate as u16 or
    # i32 run starting 0,16384,8192,5461
    dm = [0] + [16384 // d for d in range(1, 32)]
    hit = None
    for dt in ("<u2", "<i4"):
        pat = np.array(dm, dt).tobytes()
        for k in ("aom", "dav1", "dav2"):
            o = raws[k].find(pat)
            if o >= 0:
                hit = (k, dt, o)
                break
        if hit:
            break
    if hit is None:
        print("FAIL: div_mult not found in any binary",
              file=sys.stderr)
        return 1
    print(f"div_mult @{hit[0]}:{hex(hit[2])} as {hit[1]}")
    out["div_mult"] = np.array(dm, np.int32)

    # ---- ii weights ----
    # spec Ii_Weights_1d: 32-entry decay starting 60.  libaom does
    # not store this table verbatim (it derives its smooth-interintra
    # masks differently), so cross-validate across the two
    # independent dav1d builds instead: find a u8 run starting 60,
    # non-increasing, 32 long, ending small, byte-identical in BOTH.
    a = raws["dav1"]
    best_ii = None
    start = 0
    while True:
        off = a.find(bytes([60]), start)
        if off < 0:
            break
        start = off + 1
        seq = a[off:off + 32]
        arr = np.frombuffer(seq, np.uint8)
        if len(arr) == 32 and (np.diff(arr.astype(int)) <= 0).all() \
                and arr[-1] > 0 and arr[-1] < 20:
            if seq in raws["dav2"]:
                best_ii = (off, arr, 2)
                break
    if best_ii is None:
        print("FAIL: ii_weights not found", file=sys.stderr)
        return 1
    print(f"ii_weights @{hex(best_ii[0])} conf={best_ii[2]} "
          f"{best_ii[1][:8].tolist()}..")
    out["ii_weights_1d"] = best_ii[1]

    # ---- div lut ----
    divs = find_div_lut(raws["aom"])
    ok_d = []
    for off, t in divs:
        pat = t.astype("<u2").tobytes()
        c = sum(pat in raws[k] for k in ("dav1", "dav2"))
        if c >= 1:
            ok_d.append((off, t, c))
    print(f"div_lut candidates: {[(hex(o), c) for o, _, c in ok_d]}")
    if not ok_d:
        print("FAIL: div_lut not confirmed", file=sys.stderr)
        return 1
    out["div_lut"] = ok_d[0][1].astype(np.uint16)

    # ---- emit ----
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ffpic_tpu", "coding",
        "av1_mc_tables.py")
    with open(dst, "w") as f:
        f.write('"""AV1 motion-compensation constant tables '
                '(GENERATED by\ntools/extract_av1_mc_tables.py - do '
                'not edit).\n\nNormative spec constants (subpel '
                'filters 7.11.3.4, warp filters\n7.11.3.5, OBMC '
                'masks 7.11.3.10, wedge master rows 7.11.3.11,\n'
                'interintra weights 7.11.3.13, warp division LUT '
                '7.11.3.7),\nmachine-extracted from libaom and '
                'cross-validated against dav1d.\n"""\n\n'
                'import base64\nimport zlib\n\n'
                'import numpy as np\n\n')
        meta = {k: (v.shape, v.dtype.str) for k, v in out.items()}
        f.write("_META = %r\n\n" % meta)
        order = sorted(out)
        blob = b"".join(np.ascontiguousarray(out[k]).tobytes()
                        for k in order)
        comp = base64.b64encode(zlib.compress(blob, 9)).decode()
        f.write('_ORDER = %r\n\n' % order)
        f.write('_BLOB = (\n')
        for i in range(0, len(comp), 72):
            f.write('    "%s"\n' % comp[i:i + 72])
        f.write(')\n\n')
        f.write('''
def _load():
    raw = zlib.decompress(base64.b64decode(_BLOB))
    off = 0
    tabs = {}
    for name in _ORDER:
        shp, dt = _META[name]
        a = np.frombuffer(raw, dt, count=int(np.prod(shp)),
                          offset=off)
        tabs[name] = a.reshape(shp).copy()
        off += a.nbytes
    return tabs


TABLES = _load()
''')
    print("wrote", dst, {k: v.shape for k, v in out.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
