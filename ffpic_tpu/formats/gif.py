"""GIF codec — parity with format/gif.c: 87a/89a, global/local color
tables, interlacing, LZW (coding/lzw.py; the reference's
lzw_decode_gif, coding/lzw.c:17-146), animation frames with
graphic-control disposal/transparency and app/comment extensions
(gif.c:63-271). Frames composite onto the logical screen the way a
viewer would (the reference just queues raw frames).

TPU note: palette expansion for batches runs on device via
ops.png_kernels-style gather; the per-frame path here composites on
host since frames are small and sequential by design.
"""

from __future__ import annotations

import struct

import numpy as np

from ffpic_tpu.formats.pic import Pic, PixelFormat
from ffpic_tpu.formats.registry import Codec, register
from ffpic_tpu.coding.lzw import lzw_decode_gif
from ffpic_tpu.utils.vlog import get_logger

log = get_logger("gif")


def probe(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


def _read_color_table(data: bytes, pos: int, size: int):
    tbl = np.zeros((256, 4), np.uint8)
    tbl[:, 3] = 255
    tbl[:size, :3] = np.frombuffer(data, np.uint8, size * 3, pos) \
        .reshape(size, 3)
    return tbl, pos + size * 3


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = list(range(0, h, 8)) + list(range(4, h, 8)) + \
        list(range(2, h, 4)) + list(range(1, h, 2))
    out[rows] = idx
    return out


def load(data: bytes, skip_decode: bool = False) -> list[Pic]:
    version = data[3:6].decode("latin1")
    w, h = struct.unpack_from("<HH", data, 6)
    flags, bg_idx, aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 7))

    meta = dict(width=w, height=h, version=version,
                global_colors=(2 << (flags & 7)) if flags & 0x80 else 0,
                background=bg_idx, aspect=aspect, comments=[], loops=None)
    if skip_decode:
        return [Pic(width=w, height=h, depth=32, pitch=w * 4, codec="GIF",
                    meta=meta)]

    pics: list[Pic] = []
    screen = np.zeros((h, w, 4), np.uint8)
    gce = None  # (delay, transparent_idx, disposal)
    prev_screen = None

    def read_subblocks(p):
        chunks = []
        while p < len(data) and data[p]:
            n = data[p]
            chunks.append(data[p + 1:p + 1 + n])
            p += 1 + n
        return b"".join(chunks), p + 1

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9:  # graphic control
                n = data[pos + 2]
                gflags, delay, tidx = struct.unpack_from("<BHB", data, pos + 3)
                gce = dict(delay_ms=delay * 10,
                           transparent=tidx if gflags & 1 else -1,
                           disposal=(gflags >> 2) & 7)
                pos += 3 + n + 1
            elif label == 0xFE:  # comment
                blob, pos2 = read_subblocks(pos + 2)
                meta["comments"].append(blob.decode("latin1", "replace"))
                pos = pos2
            elif label == 0xFF:  # application (NETSCAPE looping)
                blob, pos2 = read_subblocks(pos + 2)
                if blob[:11] == b"NETSCAPE2.0" and len(blob) >= 14:
                    meta["loops"] = struct.unpack_from("<H", blob, 12)[0]
                pos = pos2
            else:
                _, pos = read_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
            lflags = data[pos + 9]
            pos += 10
            table = gct
            if lflags & 0x80:
                table, pos = _read_color_table(data, pos, 2 << (lflags & 7))
            if table is None:
                table = np.zeros((256, 4), np.uint8)
                table[:, 3] = 255
            min_code = data[pos]
            pos += 1
            blob, pos = read_subblocks(pos)
            idx = np.frombuffer(
                lzw_decode_gif(blob, min_code, iw * ih), np.uint8,
            )
            if idx.size < iw * ih:
                idx = np.pad(idx, (0, iw * ih - idx.size))
            idx = idx[:iw * ih].reshape(ih, iw)
            if lflags & 0x40:
                idx = _deinterlace(idx)

            rgba = table[idx]
            transparent = gce["transparent"] if gce else -1
            disposal = gce["disposal"] if gce else 0
            delay = gce["delay_ms"] if gce else 0

            if disposal == 3:
                prev_screen = screen.copy()
            region = screen[iy:iy + ih, ix:ix + iw]
            if transparent >= 0:
                mask = (idx != transparent)[..., None]
                region[:] = np.where(mask, rgba, region)
            else:
                region[:] = rgba

            frame = screen.copy()
            pics.append(Pic(pixels=frame, width=w, height=h, depth=32,
                            pitch=w * 4, format=PixelFormat.RGBA32,
                            codec="GIF", delay_ms=delay, meta=meta))

            if disposal == 2:       # restore to background
                screen[iy:iy + ih, ix:ix + iw] = 0
            elif disposal == 3 and prev_screen is not None:
                screen = prev_screen
            gce = None
        else:
            pos += 1  # tolerate junk like the reference's skip loop

    meta["frames"] = len(pics)
    return pics


def info(pic: Pic) -> str:
    m = pic.meta
    lines = [f"GIF{m['version']} file format",
             f"\twidth {m['width']}, height {m['height']}",
             f"\tglobal color table {m['global_colors']} entries, "
             f"background {m['background']}",
             f"\tframes {m.get('frames', 1)}"]
    if m.get("loops") is not None:
        lines.append(f"\tNETSCAPE loops {m['loops']}")
    for c in m.get("comments", []):
        lines.append(f"\tcomment: {c[:60]}")
    return "\n".join(lines)


register(Codec(name="GIF", probe=probe, load=load, info=info))
