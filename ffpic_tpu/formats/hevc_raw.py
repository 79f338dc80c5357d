"""Raw HEVC Annex-B elementary streams (.265/.hevc): probe + full
sequence decode through the DPB-backed SequenceDecoder.

Beyond-reference: the C reference only reaches its HEVC layer through
HEIF containers (heif.c); raw elementary streams have no entry point
there.  This module gives the full inter (P/B) decoder
(formats/hevc.py SequenceDecoder, bit-exact vs libde265) a direct
file surface for picinfo/transbmp/transcode/show.
"""

from __future__ import annotations

import numpy as np

from ffpic_tpu.formats.registry import Codec, register
from ffpic_tpu.utils.vlog import get_logger

log = get_logger("hevcraw")


def probe(data: bytes) -> bool:
    """Annex-B start code followed by a VPS/SPS/IRAP NAL header
    (forbidden_zero_bit 0, nuh_layer_id 0)."""
    for sc in (b"\x00\x00\x00\x01", b"\x00\x00\x01"):
        if data.startswith(sc):
            off = len(sc)
            if len(data) < off + 2:
                return False
            b0, b1 = data[off], data[off + 1]
            if b0 & 0x81 or (b1 >> 3) != 0 or (b1 & 7) == 0:
                return False
            t = (b0 >> 1) & 0x3F
            return t in (32, 33) or 16 <= t <= 23
    return False


def load(data: bytes, skip_decode: bool = False):
    from ffpic_tpu.formats import hevc
    from ffpic_tpu.formats.heif import _yuv_pic_to_rgba
    from ffpic_tpu.formats.pic import Pic

    if skip_decode:
        meta = _stream_meta(data)
        return [Pic(width=meta.get("width", 0),
                    height=meta.get("height", 0), codec="HEVC",
                    meta=meta)]
    dec = hevc.SequenceDecoder()
    decoded = dec.decode_annexb(data)
    if not decoded:
        raise ValueError("no decodable HEVC access units")
    # presentation order: POC within each IDR group
    groups: list = []
    for p in decoded:
        if p.poc == 0 or not groups:
            groups.append([])
        groups[-1].append(p)
    ordered = [p for g in groups
               for p in sorted(g, key=lambda q: q.poc)]
    meta = dict(_stream_meta(data), n_pictures=len(ordered))
    pics = []
    for p in ordered:
        rgba = _yuv_pic_to_rgba(p, p.sps, None, None, "bt601")
        pics.append(Pic(pixels=rgba, width=rgba.shape[1],
                        height=rgba.shape[0], codec="HEVC",
                        meta=meta, delay_ms=40))
    return pics


def _stream_meta(data: bytes) -> dict:
    from ffpic_tpu.formats import hevc
    n_au = 0
    types = set()
    sps = None
    for nalu in hevc.split_annexb(data):
        t = hevc.nal_type(nalu)
        if t == hevc.NAL_SPS:
            sps = hevc.parse_sps(nalu)
        elif t < 32 and len(nalu) >= 3 and (nalu[2] >> 7) & 1:
            n_au += 1
            types.add(t)
    out = dict(access_units=n_au, nal_types=sorted(types))
    if sps is not None:
        out.update(width=sps.pic_width_cropped,
                   height=sps.pic_height_cropped,
                   bit_depth=sps.bit_depth_luma,
                   profile=sps.ptl.profile_idc,
                   chroma_format=sps.chroma_format)
    return out


def info(pic) -> str:
    m = pic.meta
    return ("HEVC Annex-B elementary stream\n"
            f"\twidth {m.get('width', pic.width)}, "
            f"height {m.get('height', pic.height)}, "
            f"bit depth {m.get('bit_depth', 8)}\n"
            f"\taccess units {m.get('access_units', '?')}, "
            f"pictures decoded {m.get('n_pictures', 0)}, "
            f"NAL types {m.get('nal_types', [])}")


register(Codec(name="HEVC", alias="H265", probe=probe, load=load,
               info=info))
