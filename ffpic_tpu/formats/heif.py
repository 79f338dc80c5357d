"""HEIF/HEIC container codec.

Container parity with the reference's format/heif.c: ftyp brand probe
(heif.c:22-63), meta box family (iloc/iinf/ipco/ipma/iref/pitm/idat),
hvcC parameter-set extraction (heif.c:78-125), item pre-read including
idat and multi-extent items (heif.c:212-242), grid tiling
(heif.c:273-312), auxiliary alpha items, Exif items, and moov/trak
image sequences.

Pixel decode requires the HEVC intra slice decoder (the long pole,
SURVEY.md §7 step 8). This round parses parameter sets for full
structural metadata (dimensions, bit depth, chroma format, tiers) and
exposes the decode plan (grid layout, per-tile NALUs) the slice
decoder will consume; ``load`` raises a clear NotImplementedError for
pixels unless skip_decode is used.
"""

from __future__ import annotations

import struct

from ffpic_tpu.formats.pic import Pic
from ffpic_tpu.formats.registry import Codec, register
from ffpic_tpu.formats import basemedia as bm
from ffpic_tpu.formats import hevc
from ffpic_tpu.utils.vlog import get_logger

log = get_logger("heif")

BRANDS = {b"heic", b"heix", b"hevc", b"hevx", b"mif1", b"msf1", b"heim",
          b"heis", b"hevm", b"hevs"}


def probe(data: bytes) -> bool:
    if len(data) < 12 or data[4:8] != b"ftyp":
        return False
    major = data[8:12]
    if major in (b"avif", b"avis"):   # AVIF claims these (avif.py)
        return False
    if major in BRANDS:
        return True
    size = struct.unpack_from(">I", data, 0)[0]
    for off in range(16, min(size, 64), 4):
        if data[off:off + 4] in BRANDS:
            return True
    return False


def _parse_hvcc(data: bytes, box: bm.Box) -> dict:
    """hvcC: config record with parameter-set NALU arrays
    (heif.c:78-125)."""
    p = box.start
    cfg_version = data[p]
    length_size = (data[p + 21] & 3) + 1
    num_arrays = data[p + 22]
    p += 23
    nalus = {"vps": [], "sps": [], "pps": [], "sei": []}
    names = {32: "vps", 33: "sps", 34: "pps", 39: "sei", 40: "sei"}
    for _ in range(num_arrays):
        ntype = data[p] & 0x3F
        cnt = struct.unpack_from(">H", data, p + 1)[0]
        p += 3
        for _ in range(cnt):
            ln = struct.unpack_from(">H", data, p)[0]
            p += 2
            nalus.setdefault(names.get(ntype, str(ntype)), []) \
                .append(data[p:p + ln])
            p += ln
    return dict(length_size=length_size, nalus=nalus,
                version=cfg_version)


def _item_properties(data, boxes, item_id, ipma, ipco_children):
    props = {}
    for idx, _ess in ipma.get(item_id, []):
        if 1 <= idx <= len(ipco_children):
            b = ipco_children[idx - 1]
            if b.type == "ispe":
                w, h = struct.unpack_from(">II", data, b.start + 4)
                props["width"], props["height"] = w, h
            elif b.type == "hvcC":
                props["hvcC"] = _parse_hvcc(data, b)
            elif b.type == "av1C":
                props["av1C"] = data[b.start:b.start + b.size]
            elif b.type == "irot":
                props["rotation"] = (data[b.start] & 3) * 90
            elif b.type == "colr":
                props["colr"] = data[b.start:b.start + 4]
            elif b.type == "pixi":
                n = data[b.start + 4]
                props["bits_per_channel"] = list(
                    data[b.start + 5:b.start + 5 + n])
            elif b.type == "auxC":
                e = data.index(b"\0", b.start + 4)
                props["aux_type"] = data[b.start + 4:e].decode(
                    "latin1", "replace")
    return props


def parse_structure(data: bytes) -> dict:
    boxes = bm.parse_boxes(data, 0, len(data))
    meta = bm.find_box(boxes, "meta")
    if meta is None:
        raise ValueError("no meta box")
    out = {"items": {}, "primary": None, "grid": None, "refs": [],
           "sequence": bool(bm.find_box(boxes, "moov"))}

    pitm = bm.find_box(meta.children, "pitm")
    if pitm:
        if pitm.version == 0:
            out["primary"] = struct.unpack_from(">H", data,
                                                pitm.start + 4)[0]
        else:
            out["primary"] = struct.unpack_from(">I", data,
                                                pitm.start + 4)[0]

    iloc = bm.find_box(meta.children, "iloc")
    iinf = bm.find_box(meta.children, "iinf")
    ipma_box = bm.find_box(meta.children, "iprp/ipma")
    ipco = bm.find_box(meta.children, "iprp/ipco")
    iref = bm.find_box(meta.children, "iref")
    idat = bm.find_box(meta.children, "idat")

    locs = bm.parse_iloc(data, iloc) if iloc else {}
    infos = bm.parse_iinf(data, iinf) if iinf else {}
    ipma = bm.parse_ipma(data, ipma_box) if ipma_box else {}
    out["refs"] = bm.parse_iref(data, iref) if iref else []

    for item_id, info in infos.items():
        item = dict(info)
        item["extents"] = locs.get(item_id, [])
        item["properties"] = _item_properties(
            data, boxes, item_id, ipma, ipco.children if ipco else [])
        out["items"][item_id] = item

    out["idat"] = (idat.start, idat.size) if idat else None
    return out


def read_item(data: bytes, structure: dict, item_id: int) -> bytes:
    """Assemble an item's bytes from its extents (file or idat
    construction, heif.c:212-242)."""
    item = structure["items"][item_id]
    blob = bytearray()
    for method, off, ln in item["extents"]:
        if method == 1:   # idat
            base = structure["idat"][0]
            blob += data[base + off:base + off + ln]
        else:
            blob += data[off:off + ln]
    return bytes(blob)


def _grid_layout(grid_bytes: bytes) -> dict:
    ver, flags, rows, cols = grid_bytes[0], grid_bytes[1], \
        grid_bytes[2] + 1, grid_bytes[3] + 1
    if flags & 1:
        w, h = struct.unpack_from(">II", grid_bytes, 4)
    else:
        w, h = struct.unpack_from(">HH", grid_bytes, 4)
    return dict(rows=rows, cols=cols, width=w, height=h)


def load(data: bytes, skip_decode: bool = False) -> list[Pic]:
    s = parse_structure(data)
    primary_id = s["primary"]
    items = s["items"]
    meta = dict(primary=primary_id,
                n_items=len(items),
                items={i: dict(type=it["type"],
                               size=sum(e[2] for e in it["extents"]),
                               **{k: v for k, v in it["properties"].items()
                                  if k != "hvcC"})
                       for i, it in items.items()},
                sequence=s["sequence"])

    primary = items.get(primary_id, {})
    props = primary.get("properties", {})
    W = props.get("width", 0)
    H = props.get("height", 0)

    tile_ids = []
    if primary.get("type") == "grid":
        grid = _grid_layout(read_item(data, s, primary_id))
        meta["grid"] = grid
        W, H = grid["width"], grid["height"]
        for rtype, frm, tos in s["refs"]:
            if rtype == "dimg" and frm == primary_id:
                tile_ids = tos
    hvcc = props.get("hvcC")
    if hvcc is None and tile_ids:
        hvcc = items[tile_ids[0]]["properties"].get("hvcC")

    if hvcc:
        sps_list = hvcc["nalus"].get("sps", [])
        if sps_list:
            sps = hevc.parse_sps(sps_list[0])
            meta["hevc"] = dict(
                profile=sps.ptl.profile_idc, level=sps.ptl.level_idc,
                bit_depth=sps.bit_depth_luma,
                chroma_format=sps.chroma_format,
                coded_size=(sps.width, sps.height),
                ctb=1 << sps.ctb_log2)
            if not W:
                W, H = sps.pic_width_cropped, sps.pic_height_cropped

    meta.update(width=W, height=H)
    pic = Pic(width=W, height=H, depth=32, pitch=W * 4, codec="HEIF",
              meta=meta)
    if skip_decode:
        return [pic]
    raise NotImplementedError(
        "HEIF pixel decode requires the HEVC intra slice decoder "
        "(in progress; structural metadata available via skip_decode)")


def info(pic: Pic) -> str:
    m = pic.meta
    lines = ["HEIF file format",
             f"\twidth {m['width']}, height {m['height']}",
             f"\tprimary item {m['primary']}, {m['n_items']} items"]
    if m.get("grid"):
        g = m["grid"]
        lines.append(f"\tgrid {g['rows']}x{g['cols']} tiles")
    if m.get("hevc"):
        h = m["hevc"]
        lines.append(f"\tHEVC profile {h['profile']} level {h['level']} "
                     f"{h['bit_depth']}-bit chroma {h['chroma_format']} "
                     f"CTB {h['ctb']}")
    for i, it in m["items"].items():
        lines.append(f"\titem {i}: {it['type']} {it.get('width', '')}"
                     f"x{it.get('height', '')} ({it['size']} bytes)")
    return "\n".join(lines)


register(Codec(name="HEIF", alias="HEIC", probe=probe, load=load,
               info=info))
