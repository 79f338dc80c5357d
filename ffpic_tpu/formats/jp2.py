"""JPEG 2000 codec.

Box tree + codestream headers match the reference (format/jp2.c:38-447)
— and beyond it, FULL PIXEL DECODE via coding/jpeg2000.py (MQ coder +
EBCOT tier-1/tier-2 + inverse 5/3 and 9/7 wavelets + RCT/ICT): the
reference stops at packet headers and produces no pixels
(jp2.c:424-447).  Differentially validated against openjpeg (via PIL):
reversible bit-exact, irreversible within ±1."""

from __future__ import annotations

import struct

from ffpic_tpu.formats.pic import Pic
from ffpic_tpu.formats.registry import Codec, register

JP2_SIG = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
SOC = 0xFF4F


def probe(data: bytes) -> bool:
    return data.startswith(JP2_SIG) or data[:2] == b"\xff\x4f"


def _parse_codestream(data: bytes, pos: int, meta: dict) -> None:
    n = len(data)
    while pos + 4 <= n:
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == SOC:
            pos += 2
            continue
        if marker < 0xFF00:
            break
        if marker in (0xFF93,):  # SOD: entropy data follows
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4:pos + 2 + ln]
        if marker == 0xFF51:  # SIZ
            (_cap, xsiz, ysiz, x0, y0, xt, yt, xt0, yt0, ncomp) = \
                struct.unpack_from(">HIIIIIIIIH", seg, 0)
            meta.update(width=xsiz - x0, height=ysiz - y0,
                        tile_size=(xt, yt), components=ncomp)
            comps = []
            for c in range(ncomp):
                ssiz, xr, yr = struct.unpack_from(">BBB", seg, 36 + 3 * c)
                comps.append(dict(depth=(ssiz & 0x7F) + 1,
                                  signed=bool(ssiz & 0x80),
                                  dx=xr, dy=yr))
            meta["component_info"] = comps
        elif marker == 0xFF52:  # COD
            flags, prog, layers, mct = struct.unpack_from(">BBHB", seg, 0)
            levels = seg[5]
            meta.update(progression=prog, layers=layers, mct=mct,
                        decomposition_levels=levels,
                        codeblock=(4 + (seg[6] & 0xF), 4 + (seg[7] & 0xF)))
        elif marker == 0xFF5C:  # QCD
            meta["quant_style"] = seg[0] & 0x1F
        elif marker == 0xFF64:  # COM
            meta.setdefault("comments", []).append(
                seg[2:].decode("latin1", "replace"))
        pos += 2 + ln
    return


def load(data: bytes, skip_decode: bool = False) -> list[Pic]:
    meta: dict = dict(boxes=[])
    if data.startswith(JP2_SIG):
        pos = 0
        n = len(data)
        codestream = None
        while pos + 8 <= n:
            size, btype = struct.unpack_from(">I4s", data, pos)
            btype = btype.decode("latin1")
            meta["boxes"].append(btype)
            payload = pos + 8
            if size == 1:
                size = struct.unpack_from(">Q", data, pos + 8)[0]
                payload = pos + 16
            elif size == 0:
                size = n - pos
            if btype == "jp2h":
                # header sub-boxes
                q = payload
                while q + 8 <= pos + size:
                    ssz, stype = struct.unpack_from(">I4s", data, q)
                    stype = stype.decode("latin1")
                    meta["boxes"].append("jp2h/" + stype)
                    if stype == "ihdr":
                        h, w, nc, bpc = struct.unpack_from(">IIHB",
                                                           data, q + 8)
                        meta.update(width=w, height=h, components=nc,
                                    bpc=(bpc & 0x7F) + 1)
                    elif stype == "colr":
                        meth = data[q + 8]
                        if meth == 1:
                            meta["colorspace"] = struct.unpack_from(
                                ">I", data, q + 11)[0]
                    q += max(ssz, 8)
            elif btype == "jp2c":
                codestream = payload
            pos += size
        if codestream is not None:
            _parse_codestream(data, codestream, meta)
    else:
        _parse_codestream(data, 0, meta)

    W, H = meta.get("width", 0), meta.get("height", 0)
    pic = Pic(width=W, height=H, depth=32, pitch=W * 4, codec="JP2",
              meta=meta)
    if skip_decode:
        return [pic]

    import numpy as np
    import struct as _struct
    from ffpic_tpu.coding.jpeg2000 import decode_to_planes
    if data.startswith(JP2_SIG):
        if codestream is None:
            raise ValueError("JP2: no jp2c codestream box")
        cs_pos = codestream
    else:
        cs_pos = 0
    try:
        planes, jmeta = decode_to_planes(data, cs_pos)
    except (IndexError, KeyError, ZeroDivisionError, OverflowError,
            _struct.error) as e:
        raise ValueError(f"corrupt JPEG 2000 codestream: {e}") from e
    depths = jmeta["depths"]
    # scale every component to 8-bit and assemble RGBA
    chans = []
    for p, d in zip(planes, depths):
        if d > 8:
            p = p >> (d - 8)
        elif d < 8:
            p = (p.astype(np.int64) * 255) // ((1 << d) - 1)
        chans.append(p.astype(np.uint8))
    h, w = chans[0].shape
    if len(chans) == 1:
        rgba = np.dstack([chans[0]] * 3
                         + [np.full((h, w), 255, np.uint8)])
    elif len(chans) == 2:                 # gray + alpha
        rgba = np.dstack([chans[0]] * 3 + [chans[1]])
    else:
        a = chans[3] if len(chans) > 3 \
            else np.full((h, w), 255, np.uint8)
        rgba = np.dstack(chans[:3] + [a])
    pic.pixels = rgba
    pic.width, pic.height = w, h
    pic.pitch = w * 4
    return [pic]


def info(pic: Pic) -> str:
    m = pic.meta
    lines = ["JP2 file format",
             f"\twidth {m.get('width')}, height {m.get('height')}, "
             f"components {m.get('components')}"]
    if "decomposition_levels" in m:
        lines.append(f"\tprogression {m['progression']}, "
                     f"layers {m['layers']}, "
                     f"levels {m['decomposition_levels']}, "
                     f"codeblock {m['codeblock']}")
    if m.get("boxes"):
        lines.append(f"\tboxes: {' '.join(m['boxes'][:12])}")
    return "\n".join(lines)


register(Codec(name="JP2", alias="JPEG2000", probe=probe, load=load,
               info=info))
