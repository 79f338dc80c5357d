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
