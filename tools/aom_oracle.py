"""libaom DECODER oracle (ctypes over the system libaom.so.3).

Second conformance decoder next to dav1d (tools/dav1d_oracle.py) —
libaom is stricter (it validates trailing bits and errors on
overreads dav1d tolerates), which caught real bugs in our AV1
encoder during bring-up.  Returns accept/reject only; pixel-exact
comparisons go through dav1d.
"""
from __future__ import annotations

import ctypes

_LIB = None
_IFACE = None
_ABI = 22          # AOM_DECODER_ABI_VERSION for libaom 3.6


class _Ctx(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char_p), ("iface", ctypes.c_void_p),
                ("err", ctypes.c_int), ("err_detail", ctypes.c_char_p),
                ("init_flags", ctypes.c_long),
                ("config", ctypes.c_void_p), ("priv", ctypes.c_void_p)]


class _DecCfg(ctypes.Structure):
    _fields_ = [("threads", ctypes.c_uint), ("w", ctypes.c_uint),
                ("h", ctypes.c_uint),
                ("allow_lowbitdepth", ctypes.c_int)]


def _load():
    global _LIB, _IFACE
    if _LIB is None:
        _LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libaom.so.3")
        _LIB.aom_codec_av1_dx.restype = ctypes.c_void_p
        _LIB.aom_codec_error.restype = ctypes.c_char_p
        _LIB.aom_codec_error.argtypes = [ctypes.c_void_p]
        _IFACE = _LIB.aom_codec_av1_dx()
    return _LIB, _IFACE


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def aom_accepts(obus: bytes) -> tuple[bool, str]:
    """Decode a raw OBU stream with libaom; (ok, error_string)."""
    lib, iface = _load()
    ctx = _Ctx()
    cfg = _DecCfg(1, 0, 0, 1)
    rc = lib.aom_codec_dec_init_ver(
        ctypes.byref(ctx), ctypes.c_void_p(iface),
        ctypes.byref(cfg), 0, _ABI)
    if rc != 0:
        raise RuntimeError(f"aom dec init: {rc}")
    buf = ctypes.create_string_buffer(obus, len(obus))
    rc = lib.aom_codec_decode(ctypes.byref(ctx), buf, len(obus),
                              None)
    err = lib.aom_codec_error(ctypes.byref(ctx)) or b""
    lib.aom_codec_destroy(ctypes.byref(ctx))
    return rc == 0, err.decode("latin1")


# ---------------------------------------------------------------- decode
class _Image(ctypes.Structure):
    """aom_image_t prefix (aom/aom_image.h, libaom 3.x) — fields up
    to stride[]; trailing members (bps, ids, priv pointers) omitted
    since we only read planes/strides/geometry."""
    _fields_ = [("fmt", ctypes.c_int), ("cp", ctypes.c_int),
                ("tc", ctypes.c_int), ("mc", ctypes.c_int),
                ("monochrome", ctypes.c_int), ("csp", ctypes.c_int),
                ("range", ctypes.c_int),
                ("w", ctypes.c_uint), ("h", ctypes.c_uint),
                ("bit_depth", ctypes.c_uint),
                ("d_w", ctypes.c_uint), ("d_h", ctypes.c_uint),
                ("r_w", ctypes.c_uint), ("r_h", ctypes.c_uint),
                ("x_chroma_shift", ctypes.c_uint),
                ("y_chroma_shift", ctypes.c_uint),
                ("planes", ctypes.c_void_p * 3),
                ("stride", ctypes.c_int * 3)]


_AOM_IMG_FMT_HIGHBITDEPTH = 0x800


def decode_frames(obus: bytes, allow_lowbitdepth: int = 1):
    """Decode a raw OBU stream with libaom, returning a list of
    (planes, meta) like tools.dav1d_oracle.decode_obus(all_frames=
    True): planes = [Y(,U,V)] uint8/uint16 arrays, meta = w/h/bpc."""
    import numpy as np
    lib, iface = _load()
    lib.aom_codec_get_frame.restype = ctypes.POINTER(_Image)
    ctx = _Ctx()
    cfg = _DecCfg(1, 0, 0, allow_lowbitdepth)
    rc = lib.aom_codec_dec_init_ver(
        ctypes.byref(ctx), ctypes.c_void_p(iface),
        ctypes.byref(cfg), 0, _ABI)
    if rc != 0:
        raise RuntimeError(f"aom dec init: {rc}")
    out = []
    try:
        buf = ctypes.create_string_buffer(obus, len(obus))
        rc = lib.aom_codec_decode(ctypes.byref(ctx), buf, len(obus),
                                  None)
        if rc != 0:
            err = lib.aom_codec_error(ctypes.byref(ctx)) or b""
            raise RuntimeError(f"aom decode: {err.decode('latin1')}")
        it = ctypes.c_void_p()
        while True:
            img = lib.aom_codec_get_frame(ctypes.byref(ctx),
                                          ctypes.byref(it))
            if not img:
                break
            im = img.contents
            hbd = bool(im.fmt & _AOM_IMG_FMT_HIGHBITDEPTH)
            dt = np.uint16 if hbd else np.uint8
            isz = np.dtype(dt).itemsize
            w, h = im.d_w, im.d_h

            def plane(idx, pw, ph):
                stride = im.stride[idx]
                n = stride * ph
                raw = ctypes.cast(
                    im.planes[idx],
                    ctypes.POINTER(ctypes.c_uint8 * n)).contents
                a = np.frombuffer(bytearray(raw), dtype=dt)
                return a.reshape(ph, stride // isz)[:, :pw].copy()

            planes = [plane(0, w, h)]
            if not im.monochrome:
                sx, sy = im.x_chroma_shift, im.y_chroma_shift
                cw, ch = (w + sx) >> sx, (h + sy) >> sy
                planes.append(plane(1, cw, ch))
                planes.append(plane(2, cw, ch))
            out.append((planes, {"w": w, "h": h,
                                 "bpc": im.bit_depth}))
    finally:
        lib.aom_codec_destroy(ctypes.byref(ctx))
    return out
