"""OpenEXR codec — parity with format/exr.c: scanline files with
half/float/uint channels (exr.c:156-174), the half→float conversion
(exr.c:128-144), linear→sRGB transfer (exr.c:146-153), and
INCREASING/DECREASING_Y line orders. Adds ZIP/ZIPS compression support
(zlib + EXR byte-deinterleave predictor) — the reference assumes
uncompressed (exr.c:207).

TPU split: half-decode, transfer curve and channel packing are
vectorized (numpy here; jnp for batches) — the reference does all of
it per-pixel in C."""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ffpic_tpu.formats.pic import Pic, PixelFormat
from ffpic_tpu.formats.registry import Codec, register

MAGIC = b"\x76\x2f\x31\x01"

PXT_UINT, PXT_HALF, PXT_FLOAT = 0, 1, 2
_PXSIZE = {PXT_UINT: 4, PXT_HALF: 2, PXT_FLOAT: 4}


def probe(data: bytes) -> bool:
    return data[:4] == MAGIC


def _parse_header(data: bytes, pos: int):
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\0", pos)
        name = data[pos:e].decode("latin1")
        pos = e + 1
        e = data.index(b"\0", pos)
        typ = data[pos:e].decode("latin1")
        pos = e + 1
        size = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        attrs[name] = (typ, data[pos:pos + size])
        pos += size
    return attrs, pos + 1


def _rle_decode(blob: bytes, want: int) -> bytes:
    """OpenEXR RLE (ImfRle): signed count byte — negative = literal
    run of -count bytes, else repeat the next byte count+1 times; the
    output then goes through the same predictor+deinterleave transform
    as ZIP (beyond the reference, which only reads uncompressed)."""
    out = bytearray()
    i = 0
    n = len(blob)
    while i < n and len(out) < want:
        c = blob[i]
        i += 1
        if c > 127:               # signed char < 0: literal run
            cnt = 256 - c
            out += blob[i:i + cnt]
            i += cnt
        else:
            if i >= n:
                break
            out += bytes((blob[i],)) * (c + 1)
            i += 1
    return bytes(out)


def _parse_channels(blob: bytes):
    chans = []
    pos = 0
    while blob[pos] != 0:
        e = blob.index(b"\0", pos)
        name = blob[pos:e].decode("latin1")
        pos = e + 1
        ptype, _plin = struct.unpack_from("<IB", blob, pos)
        xs, ys = struct.unpack_from("<II", blob, pos + 8)
        pos += 16
        chans.append(dict(name=name, type=ptype, xs=xs, ys=ys))
    return chans


def _zip_reconstruct(raw: bytes) -> bytes:
    """EXR ZIP post-inflate reconstruction: sequential delta-decode
    (d[i] += d[i-1] - 128, vectorized as a cumsum) then de-interleave
    the two halves back into even/odd byte positions."""
    b = np.frombuffer(raw, np.uint8).astype(np.int64) - 128
    b[0] += 128
    rec = (np.cumsum(b) & 255).astype(np.uint8)
    n = len(rec)
    out = np.empty(n, np.uint8)
    half = (n + 1) // 2
    out[0::2] = rec[:half]
    out[1::2] = rec[half:]
    return out.tobytes()


def _linear_to_srgb(x: np.ndarray) -> np.ndarray:
    a = 0.055
    return np.where(x <= 0.0031308, 12.92 * x,
                    (1 + a) * np.power(np.clip(x, 0, None), 1 / 2.4) - a)


def load(data: bytes, skip_decode: bool = False) -> list[Pic]:
    version = data[4]
    flags = struct.unpack_from("<I", data, 4)[0] >> 8
    if flags & 0x200:
        raise ValueError("multipart EXR unsupported")
    tiled = bool(flags & 0x2)
    attrs, pos = _parse_header(data, 8)

    dw = struct.unpack("<iiii", attrs["dataWindow"][1])
    x0, y0, x1, y1 = dw
    w, h = x1 - x0 + 1, y1 - y0 + 1
    chans = _parse_channels(attrs["channels"][1])
    comp = attrs.get("compression", ("c", b"\0"))[1][0]
    line_order = attrs.get("lineOrder", ("l", b"\0"))[1][0]

    meta = dict(width=w, height=h, version=version, tiled=tiled,
                channels=[c["name"] for c in chans], compression=comp,
                line_order=line_order)
    if skip_decode:
        return [Pic(width=w, height=h, depth=32, pitch=w * 4, codec="EXR",
                    meta=meta)]
    if tiled:
        raise ValueError("tiled EXR unsupported")
    if comp not in (0, 1, 2, 3):
        raise ValueError(f"unsupported EXR compression {comp}")

    lines_per_block = 1 if comp in (0, 2, 1) else 16
    nblocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{nblocks}Q", data, pos)

    pixsz = sum(_PXSIZE[c["type"]] for c in chans)
    planes = {c["name"]: np.zeros((h, w), np.float32) for c in chans}

    for off in offsets:
        y, size = struct.unpack_from("<iI", data, off)
        blob = data[off + 8:off + 8 + size]
        ystart = y - y0
        nlines = min(lines_per_block, h - ystart)
        want = w * pixsz * nlines
        if comp == 0 or len(blob) >= want:
            # blocks whose compressed size is not smaller are stored
            # raw per the EXR spec
            raw = blob[:want]
        elif comp == 1:
            raw = _zip_reconstruct(_rle_decode(blob, want))[:want]
        else:
            raw = _zip_reconstruct(zlib.decompress(blob))[:want]
        # channels are stored per scanline, sorted by name, plane-major
        rpos = 0
        for ln in range(nlines):
            for c in sorted(chans, key=lambda c: c["name"]):
                nbytes = w * _PXSIZE[c["type"]]
                seg = raw[rpos:rpos + nbytes]
                rpos += nbytes
                if c["type"] == PXT_HALF:
                    vals = np.frombuffer(seg, np.float16).astype(np.float32)
                elif c["type"] == PXT_FLOAT:
                    vals = np.frombuffer(seg, np.float32)
                else:
                    vals = np.frombuffer(seg, np.uint32).astype(np.float32)
                planes[c["name"]][ystart + ln, :len(vals)] = vals

    if line_order == 1:  # DECREASING_Y
        for k in planes:
            planes[k] = planes[k][::-1]

    names = {c["name"] for c in chans}

    def chan(n, default=0.0):
        return planes.get(n, np.full((h, w), default, np.float32))

    if {"R", "G", "B"} & names:
        r, g, b = chan("R"), chan("G"), chan("B")
    elif "Y" in names:
        r = g = b = chan("Y")
    else:
        first = sorted(names)[0]
        r = g = b = planes[first]
    a = chan("A", 1.0)

    def to8(x):
        return np.clip(_linear_to_srgb(x) * 255.0 + 0.5, 0, 255) \
            .astype(np.uint8)

    rgba = np.dstack([to8(r), to8(g), to8(b),
                      np.clip(a * 255 + 0.5, 0, 255).astype(np.uint8)])
    return [Pic(pixels=rgba, width=w, height=h, depth=32, pitch=w * 4,
                format=PixelFormat.RGBA32, codec="EXR", meta=meta)]


def info(pic: Pic) -> str:
    m = pic.meta
    comp_names = {0: "none", 1: "RLE", 2: "ZIPS", 3: "ZIP", 4: "PIZ"}
    return ("EXR file format\n"
            f"\twidth {m['width']}, height {m['height']}\n"
            f"\tchannels {' '.join(m['channels'])}\n"
            f"\tcompression {comp_names.get(m['compression'], m['compression'])}, "
            f"{'tiled' if m['tiled'] else 'scanline'}, "
            f"{'decreasing' if m['line_order'] else 'increasing'} Y")


register(Codec(name="EXR", alias="OPENEXR", probe=probe, load=load,
               info=info))
