"""YUV-level AV1 decode oracle: drives the dav1d decoder statically
linked into Pillow's bundled libavif via ctypes.

dav1d's public API (dav1d_open/send_data/get_picture) is exported from
`pillow.libs/libavif-*.so` (verified: dav1d 1.5.1, API 7.x), which
gives us plane-level YUV output — a stronger conformance oracle for
our AV1 intra decoder than PIL's post-colorconvert RGB.  Struct
layouts follow dav1d 1.x `include/dav1d/dav1d.h`; Dav1dSettings is
over-allocated with trailing padding as a safety margin (dav1d only
writes sizeof(Dav1dSettings) <= our size).

Usage:
    from tools.dav1d_oracle import decode_obus
    planes, meta = decode_obus(obu_bytes)   # [Y, U, V] uint8/uint16
"""

from __future__ import annotations

import ctypes
import glob
import os

import numpy as np


def _find_libavif() -> str:
    import PIL
    root = os.path.join(os.path.dirname(PIL.__file__), os.pardir,
                        "pillow.libs")
    hits = glob.glob(os.path.join(root, "libavif*.so*"))
    if not hits:
        raise FileNotFoundError("bundled libavif not found")
    return hits[0]


class _PicAllocator(ctypes.Structure):
    _fields_ = [("cookie", ctypes.c_void_p),
                ("alloc_picture_callback", ctypes.c_void_p),
                ("release_picture_callback", ctypes.c_void_p)]


class _Logger(ctypes.Structure):
    _fields_ = [("cookie", ctypes.c_void_p),
                ("callback", ctypes.c_void_p)]


class _Settings(ctypes.Structure):
    # dav1d 1.x Dav1dSettings + 64 bytes of paranoia padding
    _fields_ = [("n_threads", ctypes.c_int),
                ("max_frame_delay", ctypes.c_int),
                ("apply_grain", ctypes.c_int),
                ("operating_point", ctypes.c_int),
                ("all_layers", ctypes.c_int),
                ("frame_size_limit", ctypes.c_uint),
                ("allocator", _PicAllocator),
                ("logger", _Logger),
                ("strict_std_compliance", ctypes.c_int),
                ("output_invisible_frames", ctypes.c_int),
                ("inloop_filters", ctypes.c_int),
                ("decode_frame_type", ctypes.c_int),
                ("reserved", ctypes.c_uint8 * 16),
                ("pad", ctypes.c_uint8 * 64)]


class _UserData(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p), ("ref", ctypes.c_void_p)]


class _DataProps(ctypes.Structure):
    _fields_ = [("timestamp", ctypes.c_int64),
                ("duration", ctypes.c_int64),
                ("offset", ctypes.c_int64),
                ("size", ctypes.c_size_t),
                ("user_data", _UserData)]


class _Data(ctypes.Structure):
    _fields_ = [("data", ctypes.c_void_p),
                ("sz", ctypes.c_size_t),
                ("ref", ctypes.c_void_p),
                ("m", _DataProps)]


class _PicParams(ctypes.Structure):
    _fields_ = [("w", ctypes.c_int), ("h", ctypes.c_int),
                ("layout", ctypes.c_int), ("bpc", ctypes.c_int)]


class _Picture(ctypes.Structure):
    _fields_ = [("seq_hdr", ctypes.c_void_p),
                ("frame_hdr", ctypes.c_void_p),
                ("data", ctypes.c_void_p * 3),
                ("stride", ctypes.c_ssize_t * 2),
                ("p", _PicParams),
                ("m", _DataProps),
                ("content_light", ctypes.c_void_p),
                ("mastering_display", ctypes.c_void_p),
                ("itut_t35", ctypes.c_void_p),
                ("n_itut_t35", ctypes.c_size_t),
                ("reserved", ctypes.c_void_p * 4),
                ("frame_hdr_ref", ctypes.c_void_p),
                ("seq_hdr_ref", ctypes.c_void_p),
                ("content_light_ref", ctypes.c_void_p),
                ("mastering_display_ref", ctypes.c_void_p),
                ("itut_t35_ref", ctypes.c_void_p),
                ("reserved_ref", ctypes.c_void_p * 4),
                ("ref", ctypes.c_void_p),
                ("allocator_data", ctypes.c_void_p),
                ("pad", ctypes.c_uint8 * 64)]


_lib = None
_FREE_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)


@_FREE_CB
def _noop_free(data, cookie):   # dav1d requires a non-NULL callback
    pass


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_find_libavif())
        _lib.dav1d_version.restype = ctypes.c_char_p
    return _lib


# Dav1dPixelLayout
LAYOUT_I400, LAYOUT_I420, LAYOUT_I422, LAYOUT_I444 = range(4)

_SUBSAMP = {LAYOUT_I400: None, LAYOUT_I420: (1, 1),
            LAYOUT_I422: (1, 0), LAYOUT_I444: (0, 0)}


def decode_obus(obus: bytes, all_frames: bool = False,
                inloop_filters: int | None = None):
    """Decode a raw AV1 OBU stream (e.g. an AVIF av01 item payload).

    Returns (planes, meta): planes = [Y] or [Y, U, V] numpy arrays
    (uint8 for bpc 8, uint16 otherwise), meta = dict with w/h/layout/
    bpc.  With all_frames=True returns a list of (planes, meta).
    inloop_filters: bitmask (1=deblock, 2=CDEF, 4=restoration; None =
    dav1d default ALL) — lets differential tests pin each in-loop
    filter stage independently.
    """
    lib = _load()
    s = _Settings()
    lib.dav1d_default_settings(ctypes.byref(s))
    s.n_threads = 1
    if inloop_filters is not None:
        s.inloop_filters = inloop_filters
    ctx = ctypes.c_void_p()
    rc = lib.dav1d_open(ctypes.byref(ctx), ctypes.byref(s))
    if rc != 0:
        raise RuntimeError(f"dav1d_open: {rc}")
    out = []
    try:
        buf = ctypes.create_string_buffer(obus, len(obus))
        d = _Data()
        ptr = ctypes.c_void_p()
        rc = lib.dav1d_data_wrap(
            ctypes.byref(d), ctypes.cast(buf, ctypes.c_void_p),
            ctypes.c_size_t(len(obus)), _noop_free, None)
        if rc != 0:
            raise RuntimeError(f"dav1d_data_wrap: {rc}")
        EAGAIN = -11
        sent = False
        while True:
            if not sent:
                rc = lib.dav1d_send_data(ctx, ctypes.byref(d))
                if rc == 0 and d.sz == 0:
                    sent = True
                elif rc not in (0, EAGAIN):
                    raise RuntimeError(f"dav1d_send_data: {rc}")
            pic = _Picture()
            rc = lib.dav1d_get_picture(ctx, ctypes.byref(pic))
            if rc == EAGAIN:
                if sent:
                    break
                continue
            if rc != 0:
                raise RuntimeError(f"dav1d_get_picture: {rc}")
            out.append(_extract(pic))
            lib.dav1d_picture_unref(ctypes.byref(pic))
            if not all_frames and sent:
                break
    finally:
        lib.dav1d_close(ctypes.byref(ctx))
    if not out:
        raise RuntimeError("dav1d produced no pictures")
    return out if all_frames else out[0]


def _extract(pic: _Picture):
    w, h, layout, bpc = pic.p.w, pic.p.h, pic.p.layout, pic.p.bpc
    assert 0 < w <= 1 << 16 and 0 < h <= 1 << 16, (w, h)
    assert layout in _SUBSAMP, layout
    dt = np.uint8 if bpc == 8 else np.uint16
    isz = np.dtype(dt).itemsize

    def plane(idx, pw, ph, stride):
        n = stride * ph
        raw = ctypes.cast(pic.data[idx],
                          ctypes.POINTER(ctypes.c_uint8 * n)).contents
        a = np.frombuffer(bytearray(raw), dtype=dt)
        a = a.reshape(ph, stride // isz)[:, :pw]
        return a.copy()

    planes = [plane(0, w, h, pic.stride[0])]
    sub = _SUBSAMP[layout]
    if sub is not None:
        sx, sy = sub
        cw, ch = (w + sx) >> sx, (h + sy) >> sy
        planes.append(plane(1, cw, ch, pic.stride[1]))
        planes.append(plane(2, cw, ch, pic.stride[1]))
    meta = {"w": w, "h": h, "layout": layout, "bpc": bpc}
    return planes, meta


def avif_item_obus(avif_bytes: bytes) -> bytes:
    """Pull the primary av01 item payload out of an AVIF container."""
    from ffpic_tpu.formats import heif as heif_mod
    s = heif_mod.parse_structure(avif_bytes)
    return heif_mod.read_item(avif_bytes, s, s["primary"])


if __name__ == "__main__":
    import sys
    data = open(sys.argv[1], "rb").read()
    if data[4:8] == b"ftyp":
        data = avif_item_obus(data)
    (pl, meta) = decode_obus(data)
    print(meta, [p.shape for p in pl],
          [int(p.astype(np.int64).sum()) for p in pl])
