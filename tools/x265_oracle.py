"""x265 ENCODER oracle (ctypes over libx265.so.199): mints real
HEVC P/B streams for the inter parse-parity tests.

The unmangled C API (x265_param_alloc / x265_param_parse /
x265_encoder_open_199 / x265_encoder_encode) is stable; the only
layout-sensitive piece is x265_picture, whose plane/stride fields are
located by probing the struct after x265_picture_init the same way
tools/aom_oracle.py probes aom_codec_enc_cfg.

The C reference parses P/B slice syntax and discards it
(hevc.c:6285-6397); this oracle lets the rebuild validate its own
parse-and-skip layer against real inter bitstreams.
"""

import ctypes
import os

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libx265.so.199")
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


class _Nal(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32),
                ("sizeBytes", ctypes.c_uint32),
                ("payload", ctypes.POINTER(ctypes.c_uint8))]


def encode_frames(frames, gop: int = 8, bframes: int = 0,
                  preset: str = "ultrafast", qp: int = 30,
                  extra: dict | None = None) -> bytes:
    """Encode YUV420 8-bit frames ([Y,U,V] uint8 numpy planes) to an
    Annex-B HEVC stream with real P (and optionally B) slices."""
    import numpy as np
    lib = _load()
    lib.x265_param_alloc.restype = ctypes.c_void_p
    par = lib.x265_param_alloc()
    if not par:
        raise RuntimeError("x265_param_alloc")
    h, w = frames[0][0].shape
    rc = lib.x265_param_default_preset(
        ctypes.c_void_p(par), preset.encode(), b"psnr")
    if rc != 0:
        raise RuntimeError("param_default_preset")

    def setp(k, v):
        r = lib.x265_param_parse(ctypes.c_void_p(par), k.encode(),
                                 str(v).encode())
        if r != 0:
            raise RuntimeError(f"param_parse {k}={v}: {r}")

    setp("input-res", f"{w}x{h}")
    setp("fps", "25")
    setp("input-csp", "i420")
    setp("keyint", gop)
    setp("min-keyint", gop)
    setp("bframes", bframes)
    setp("qp", qp)
    setp("frame-threads", 1)
    setp("pools", "1")
    setp("scenecut", 0)
    setp("annexb", 1)
    setp("repeat-headers", 1)
    setp("info", 0)
    setp("log-level", "none")
    for k, v in (extra or {}).items():
        setp(k, v)

    lib.x265_encoder_open_199.restype = ctypes.c_void_p
    enc = lib.x265_encoder_open_199(ctypes.c_void_p(par))
    if not enc:
        raise RuntimeError("encoder_open")

    lib.x265_picture_alloc.restype = ctypes.c_void_p
    pic = lib.x265_picture_alloc()
    lib.x265_picture_init(ctypes.c_void_p(par), ctypes.c_void_p(pic))

    # probe the x265_picture layout: find planes[3] (pointers) and
    # stride[3] (ints) by writing through candidate offsets and
    # re-reading.  Known x265 3.x layout: pts(8) dts(8) userData(8)
    # planes[3] (24 bytes) stride[3] (12) bitDepth(4) sliceType(4)...
    # Validate bitDepth==8 at the expected offset to confirm.
    base = ctypes.cast(pic, ctypes.POINTER(ctypes.c_uint8))
    raw = ctypes.string_at(pic, 256)

    def find_layout():
        import struct as s
        for off in range(16, 96, 8):
            # planes at off..off+24, stride at off+24..off+36,
            # bitDepth at off+36
            bd = s.unpack_from("<i", raw, off + 36)[0]
            if bd == 8:
                return off
        raise RuntimeError("x265_picture layout probe failed")
    poff = find_layout()

    out = bytearray()
    pp_nal = ctypes.POINTER(_Nal)()
    pi_nal = ctypes.c_uint32()

    def drain():
        for i in range(pi_nal.value):
            n = pp_nal[i]
            out.extend(ctypes.string_at(n.payload, n.sizeBytes))

    bufs = []
    for fr in frames:
        y = np.ascontiguousarray(fr[0], np.uint8)
        u = np.ascontiguousarray(fr[1], np.uint8)
        v = np.ascontiguousarray(fr[2], np.uint8)
        bufs.append((y, u, v))
        ptrs = (ctypes.c_void_p * 3)(
            y.ctypes.data, u.ctypes.data, v.ctypes.data)
        strides = (ctypes.c_int32 * 3)(w, w // 2, w // 2)
        ctypes.memmove(ctypes.addressof(base.contents) + poff,
                       ptrs, 24)
        ctypes.memmove(ctypes.addressof(base.contents) + poff + 24,
                       strides, 12)
        rc = lib.x265_encoder_encode(
            ctypes.c_void_p(enc), ctypes.byref(pp_nal),
            ctypes.byref(pi_nal), ctypes.c_void_p(pic), None)
        if rc < 0:
            raise RuntimeError("encoder_encode")
        drain()
    while True:
        rc = lib.x265_encoder_encode(
            ctypes.c_void_p(enc), ctypes.byref(pp_nal),
            ctypes.byref(pi_nal), None, None)
        if rc <= 0:
            break
        drain()
    lib.x265_encoder_close(ctypes.c_void_p(enc))
    lib.x265_picture_free(ctypes.c_void_p(pic))
    lib.x265_param_free(ctypes.c_void_p(par))
    return bytes(out)
