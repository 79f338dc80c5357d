"""libde265 DECODER oracle (ctypes over libde265.so.0): an
independent HEVC decoder for bit-exact plane comparisons.

Third leg of the HEVC oracle stack: the compiled C reference
(refbuild-asan, crashes on several conforming shapes), the repo's
own encoder roundtrips, and now a production decoder.  Also the
future pixel oracle for full P/B inter decode (the round-5 parse
layer is CABAC-synced; MC is round-6 work).
"""

import ctypes

_LIB = None


def _load():
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libde265.so.0")
        _LIB.de265_new_decoder.restype = ctypes.c_void_p
        _LIB.de265_get_next_picture.restype = ctypes.c_void_p
        _LIB.de265_get_image_plane.restype = \
            ctypes.POINTER(ctypes.c_uint8)
    return _LIB


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def decode_annexb(stream: bytes):
    """Decode an Annex-B HEVC stream; returns a list of per-picture
    [Y, U, V] uint8/uint16 numpy planes (16-bit for >8-bit depth)."""
    import numpy as np
    lib = _load()
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise RuntimeError("de265_new_decoder")
    rc = lib.de265_push_data(ctypes.c_void_p(ctx), stream,
                             ctypes.c_int(len(stream)),
                             ctypes.c_longlong(0), None)
    if rc != 0:
        raise RuntimeError(f"de265_push_data: {rc}")
    lib.de265_flush_data(ctypes.c_void_p(ctx))
    out = []
    more = ctypes.c_int(1)
    while more.value:
        rc = lib.de265_decode(ctypes.c_void_p(ctx),
                              ctypes.byref(more))
        if rc not in (0, 20):      # DE265_OK / waiting-for-input
            break
        while True:
            pic = lib.de265_get_next_picture(ctypes.c_void_p(ctx))
            if not pic:
                break
            planes = []
            for p in range(3):
                w = lib.de265_get_image_width(
                    ctypes.c_void_p(pic), ctypes.c_int(p))
                h = lib.de265_get_image_height(
                    ctypes.c_void_p(pic), ctypes.c_int(p))
                bits = lib.de265_get_bits_per_pixel(
                    ctypes.c_void_p(pic), ctypes.c_int(p))
                stride = ctypes.c_int()
                ptr = lib.de265_get_image_plane(
                    ctypes.c_void_p(pic), ctypes.c_int(p),
                    ctypes.byref(stride))
                bypp = 2 if bits > 8 else 1
                buf = ctypes.string_at(ptr, stride.value * h)
                arr = np.frombuffer(
                    buf, np.uint16 if bypp == 2 else np.uint8
                ).reshape(h, stride.value // bypp)[:, :w].copy()
                planes.append(arr)
            out.append(planes)
    lib.de265_free_decoder(ctypes.c_void_p(ctx))
    return out
