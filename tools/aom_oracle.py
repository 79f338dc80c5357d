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


# ----------------------------------------------------------- encoder
# libaom ENCODER via ctypes: mints conformance streams with an
# independent (non-self) encoder — the 10-bit / multi-ref / compound
# oracle VERDICT r3 asked for.  aom_codec_enc_cfg_t is a large
# version-dependent struct; rather than declaring every field we let
# aom_codec_enc_config_default() fill an oversized buffer and locate
# the g_w/g_h block by its known defaults (320x240), which anchors
# the handful of fields we need to poke.

_AOM_CODEC_USE_HIGHBITDEPTH = 0x40000
_AOM_IMG_FMT_I420 = 0x102
_AOM_IMG_FMT_I42016 = 0x102 | 0x800
_AOME_SET_CPUUSED = 13
_AOM_EFLAG_FORCE_KF = 1 << 0


def _enc_cfg_offsets(buf: bytes):
    """Locate g_w inside the default-initialized enc cfg: the struct
    leads with usage/threads/profile then g_w=320, g_h=240."""
    import struct as _s
    for off in range(0, 128, 4):
        w, h = _s.unpack_from("<II", buf, off)
        if w == 320 and h == 240:
            # layout after g_h: g_limit, g_forced_max_frame_width,
            # g_forced_max_frame_height, then the bit depths
            return dict(g_w=off, g_h=off + 4,
                        g_limit=off + 8,
                        g_forced_max_frame_width=off + 12,
                        g_forced_max_frame_height=off + 16,
                        g_bit_depth=off + 20,
                        g_input_bit_depth=off + 24,
                        g_timebase_num=off + 28,
                        g_timebase_den=off + 32,
                        g_error_resilient=off + 36,
                        g_pass=off + 40,
                        g_lag_in_frames=off + 44,
                        g_profile=off - 4, g_threads=off - 8,
                        g_usage=off - 12)
    raise RuntimeError("could not locate g_w/g_h in aom enc cfg")


class _CxPkt(ctypes.Structure):
    _fields_ = [("kind", ctypes.c_int),
                ("buf", ctypes.c_void_p), ("sz", ctypes.c_size_t),
                ("pts", ctypes.c_longlong),
                ("duration", ctypes.c_ulong),
                ("flags", ctypes.c_uint),
                ("partition_id", ctypes.c_int),
                ("vis", ctypes.c_uint * 2)]


_AOM_IMG_FMT_I422 = 0x105
_AOM_IMG_FMT_I444 = 0x106


def encode_frames(frames, bit_depth: int = 8, speed: int = 6,
                  q: int = 40, lag: int | None = None,
                  usage: int = 0, subsampling: str = "420",
                  profile: int | None = None):
    """Encode YUV420 frames with libaom; returns the raw OBU stream
    (temporal units concatenated, sequence header included).

    frames: list of [Y, U, V] numpy planes (uint8 for 8-bit,
    uint16 for 10-bit with values < 1024).  Returns bytes our
    decoder and dav1d both consume (tests/test_av1_inter.py uses
    this to mint 10-bit and multi-ref conformance streams)."""
    import numpy as np
    lib, _ = _load()
    lib.aom_codec_av1_cx.restype = ctypes.c_void_p
    enc_iface = lib.aom_codec_av1_cx()
    cfgbuf = ctypes.create_string_buffer(8192)
    rc = lib.aom_codec_enc_config_default(
        ctypes.c_void_p(enc_iface), cfgbuf, ctypes.c_uint(usage))
    if rc != 0:
        raise RuntimeError(f"enc_config_default: {rc}")
    offs = _enc_cfg_offsets(cfgbuf.raw)
    h, w = frames[0][0].shape
    import struct as _s

    def poke(name, val):
        _s.pack_into("<I", cfgbuf, offs[name], val)

    if profile is None:
        # profile 0: 420 8/10-bit; 1: 444 8/10; 2: 422 or 12-bit
        if bit_depth == 12 or subsampling == "422":
            profile = 2
        elif subsampling == "444":
            profile = 1
        else:
            profile = 0
    poke("g_profile", profile)
    poke("g_w", w)
    poke("g_h", h)
    poke("g_bit_depth", bit_depth)
    poke("g_input_bit_depth", bit_depth)
    if lag is not None:
        poke("g_lag_in_frames", lag)
    flags = _AOM_CODEC_USE_HIGHBITDEPTH if bit_depth > 8 else 0
    ctx = _Ctx()
    _ENC_ABI = 25              # AOM_ENCODER_ABI_VERSION for 3.6
    rc = lib.aom_codec_enc_init_ver(
        ctypes.byref(ctx), ctypes.c_void_p(enc_iface), cfgbuf,
        ctypes.c_long(flags), _ENC_ABI)
    if rc != 0:
        raise RuntimeError(f"enc init: {rc} {ctx.err_detail}")
    out = bytearray()
    try:
        lib.aom_codec_control(ctypes.byref(ctx), _AOME_SET_CPUUSED,
                              ctypes.c_int(speed))
        # AOME_SET_CQ_LEVEL=255+13? — leave rate control at defaults
        fmt = {"420": _AOM_IMG_FMT_I420,
               "422": _AOM_IMG_FMT_I422,
               "444": _AOM_IMG_FMT_I444}[subsampling]
        if bit_depth > 8:
            fmt |= 0x800
        lib.aom_img_alloc.restype = ctypes.POINTER(_Image)
        img_p = lib.aom_img_alloc(None, ctypes.c_int(fmt),
                                  ctypes.c_uint(w), ctypes.c_uint(h),
                                  ctypes.c_uint(32))
        if not img_p:
            raise RuntimeError("aom_img_alloc failed")
        lib.aom_codec_get_cx_data.restype = ctypes.POINTER(_CxPkt)

        def drain():
            it = ctypes.c_void_p()
            while True:
                pkt = lib.aom_codec_get_cx_data(ctypes.byref(ctx),
                                                ctypes.byref(it))
                if not pkt:
                    break
                p = pkt.contents
                if p.kind == 0:      # AOM_CODEC_CX_FRAME_PKT
                    out.extend(ctypes.string_at(p.buf, p.sz))

        dt = np.uint16 if bit_depth > 8 else np.uint8
        isz = np.dtype(dt).itemsize
        for fi, planes in enumerate(frames):
            im = img_p.contents
            for pi in range(3):
                pl = np.ascontiguousarray(planes[pi].astype(dt))
                ph, pw = pl.shape
                stride = im.stride[pi]
                dst = ctypes.cast(
                    im.planes[pi],
                    ctypes.POINTER(ctypes.c_uint8))
                src = pl.tobytes()
                rowb = pw * isz
                for y in range(ph):
                    ctypes.memmove(
                        ctypes.byref(dst.contents, y * stride),
                        src[y * rowb:(y + 1) * rowb], rowb)
            rc = lib.aom_codec_encode(
                ctypes.byref(ctx), img_p,
                ctypes.c_longlong(fi), ctypes.c_ulong(1),
                ctypes.c_long(0))
            if rc != 0:
                err = lib.aom_codec_error(ctypes.byref(ctx)) or b""
                raise RuntimeError(
                    f"encode: {err.decode('latin1')}")
            drain()
        # flush
        while True:
            n0 = len(out)
            rc = lib.aom_codec_encode(ctypes.byref(ctx), None,
                                      ctypes.c_longlong(len(frames)),
                                      ctypes.c_ulong(1),
                                      ctypes.c_long(0))
            if rc != 0:
                break
            drain()
            if len(out) == n0:
                break
        lib.aom_img_free(img_p)
    finally:
        lib.aom_codec_destroy(ctypes.byref(ctx))
    return bytes(out)
