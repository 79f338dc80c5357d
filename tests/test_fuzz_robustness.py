"""Corrupt-input robustness: random byte mutations must yield clean
errors or decodes, never crashes/memory corruption.  A fast regression
subset of the ASAN fuzz campaign (the native decoders are bounds-
hardened: htable canonical-space check, DHT-slot validation, HEVC
SPS/PPS range validation + map clamps)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


@pytest.mark.parametrize("name", ["jpeg_512_420.jpg",
                                  "jpeg_prog_512_420.jpg",
                                  "gif_512.gif", "webp_512.webp",
                                  "png_512_rgba.png", "bmp_512.bmp",
                                  "ppm_512.ppm", "tga_512.tga"])
def test_byte_corruption_never_crashes(name):
    import ffpic_tpu
    path = os.path.join(CORPUS, name)
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    data = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    for trial in range(12):
        d = bytearray(data)
        for _ in range(rng.integers(1, 40)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_heic_corruption_never_crashes(tmp_path):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    rng = np.random.default_rng(5)
    rgba = np.kron(rng.integers(0, 256, (4, 5, 3)),
                   np.ones((16, 16, 1)))
    rgba = np.concatenate([rgba, np.full((64, 80, 1), 255)],
                          axis=-1).astype(np.uint8)
    pic = Pic(width=80, height=64, depth=32, pitch=320, codec="raw",
              pixels=rgba)
    data = bytearray(ffpic_tpu.encode(pic, "heif", qp=28))
    for trial in range(20):
        d = bytearray(data)
        for _ in range(rng.integers(1, 30)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def _mutate_structure(rng, data: bytearray, kind: str) -> bytearray:
    """Structure-aware mutations: attack length/count fields rather
    than random bytes, reaching parser paths plain byte fuzz misses."""
    d = bytearray(data)
    if kind == "isobmff":
        # find box headers (size + 4 ascii chars) and corrupt sizes
        for pos in range(0, min(len(d) - 8, 4000), 4):
            tag = d[pos + 4:pos + 8]
            if tag.isalpha() or tag in (b"jp2c", b"iloc", b"iinf"):
                if rng.random() < 0.15:
                    sz = int(rng.choice([0, 1, 7, 2 ** 31,
                                         0xFFFFFFFF,
                                         len(d) * 2]))
                    d[pos:pos + 4] = sz.to_bytes(4, "big")
    elif kind == "jpeg":
        # corrupt marker segment lengths and DHT counts
        i = 2
        while i + 4 < len(d):
            if d[i] != 0xFF:
                i += 1
                continue
            m = d[i + 1]
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD9:
                i += 2
                continue
            ln = int.from_bytes(d[i + 2:i + 4], "big")
            r = rng.random()
            if r < 0.2:
                bad = int(rng.choice([0, 1, 2, 65535, ln + 7]))
                d[i + 2:i + 4] = bad.to_bytes(2, "big")
            elif m == 0xC4 and r < 0.5 and i + 8 < len(d):
                # DHT: corrupt the 16 count bytes
                k = i + 5 + int(rng.integers(0, 16))
                if k < len(d):
                    d[k] = int(rng.integers(0, 256))
            if ln < 2:
                break
            i += 2 + ln
    elif kind == "riff":
        # chunk size fields
        pos = 12
        while pos + 8 < len(d):
            if rng.random() < 0.3:
                sz = int(rng.choice([0, 1, 2 ** 31, len(d) * 3]))
                d[pos + 4:pos + 8] = sz.to_bytes(4, "little")
            ln = int.from_bytes(d[pos + 4:pos + 8], "little")
            if ln > len(d):
                break
            pos += 8 + ln + (ln & 1)
    return d


@pytest.mark.parametrize("name,kind", [
    ("jpeg_512_420.jpg", "jpeg"),
    ("jpeg_prog_512_420.jpg", "jpeg"),
    ("webp_512.webp", "riff"),
])
def test_structure_aware_corruption_never_crashes(name, kind):
    """Mutate length/count fields specifically (VERDICT r2 #9 /
    NEXT #7): box sizes, marker segment lengths, DHT code counts,
    RIFF chunk sizes."""
    import ffpic_tpu
    path = os.path.join(CORPUS, name)
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    data = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(hash(name) & 0xFFF)
    for trial in range(15):
        d = _mutate_structure(rng, data, kind)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_structure_aware_heic_boxes(tmp_path):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    rng = np.random.default_rng(11)
    rgba = np.kron(rng.integers(0, 256, (4, 4, 3)),
                   np.ones((16, 16, 1)))
    rgba = np.concatenate([rgba, np.full((64, 64, 1), 255)],
                          axis=-1).astype(np.uint8)
    pic = Pic(width=64, height=64, depth=32, pitch=256, codec="raw",
              pixels=rgba)
    data = bytearray(ffpic_tpu.encode(pic, "heif", qp=30))
    for trial in range(20):
        d = _mutate_structure(rng, data, "isobmff")
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_structure_aware_jp2(tmp_path):
    """JP2: box sizes + codestream marker lengths (new pixel decoder
    must be robust too)."""
    import io
    import ffpic_tpu
    from PIL import Image
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG2000", irreversible=False)
    data = bytearray(b.getvalue())
    for trial in range(25):
        d = _mutate_structure(rng, data, "isobmff")
        # also random byte noise inside the codestream
        for _ in range(int(rng.integers(1, 25))):
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


@pytest.mark.parametrize("comp", ["raw", "tiff_lzw",
                                  "tiff_adobe_deflate", "packbits"])
def test_tiff_corruption_never_crashes(tmp_path, comp):
    """TIFF (all strip codecs incl. the native LZW) under random byte
    corruption: ValueError/NotImplementedError only, never a crash."""
    import io
    from PIL import Image
    import ffpic_tpu
    rng = np.random.default_rng(hash(comp) & 0xFFFF)
    arr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "TIFF", compression=comp)
    data = b.getvalue()
    for _ in range(60):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 40))):
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_ico_corruption_never_crashes(tmp_path):
    import io
    from PIL import Image
    import ffpic_tpu
    rng = np.random.default_rng(77)
    arr = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "ICO", sizes=[(64, 64), (32, 32)])
    data = b.getvalue()
    for _ in range(80):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 40))):
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_exr_psd_corruption_never_crashes():
    """Hand-crafted EXR + PSD seeds under byte corruption."""
    import struct
    import ffpic_tpu
    from test_formats_tiff_exr_psd import _write_exr_half
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    exr = _write_exr_half(arr.astype(np.float32) / 255.0)
    h, w = arr.shape[:2]
    hdr = struct.pack(">4sH6sHIIHH", b"8BPS", 1, b"\0" * 6, 3, h, w,
                      8, 3)
    body = struct.pack(">I", 0) * 3
    img = struct.pack(">H", 0) + arr[..., 0].tobytes() + \
        arr[..., 1].tobytes() + arr[..., 2].tobytes()
    psd = hdr + body + img
    for data in (exr, psd):
        for _ in range(80):
            d = bytearray(data)
            for _ in range(int(rng.integers(1, 40))):
                d[int(rng.integers(0, len(d)))] = \
                    int(rng.integers(0, 256))
            try:
                ffpic_tpu.load(bytes(d))
            except (ValueError, NotImplementedError, OSError):
                pass


def test_svg_corruption_never_crashes():
    """SVG rasterizer: text-level mutations (tag splices, attribute
    garbage, numeric extremes) must yield clean errors or pixels —
    the parser is stdlib XML, the rasterizer must bound dimensions
    and survive malformed numbers/paths/transforms."""
    import ffpic_tpu

    base = (b'<svg xmlns="http://www.w3.org/2000/svg" width="64" '
            b'height="48" viewBox="0 0 64 48">'
            b'<defs><linearGradient id="g"><stop offset="0" '
            b'stop-color="red"/><stop offset="1" stop-color="blue"/>'
            b'</linearGradient></defs>'
            b'<rect x="2" y="2" width="30" height="20" fill="url(#g)"/>'
            b'<path d="M5 5 C10 0 20 40 30 5 A8 4 30 1 0 40 20 Z" '
            b'stroke="black" stroke-width="3" fill="lime"/>'
            b'<g transform="rotate(33 20 20) scale(1.5)">'
            b'<circle cx="10" cy="10" r="7" fill-opacity="0.5"/>'
            b'</g><use href="#g" x="1" y="1"/></svg>')
    rng = np.random.default_rng(0x5176)
    for trial in range(40):
        d = bytearray(base)
        for _ in range(rng.integers(1, 12)):
            pos = rng.integers(0, len(d))
            d[pos] = rng.integers(32, 127)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass

    # structured hostile cases
    hostile = [
        b'<svg xmlns="a" width="1e30" height="5"><rect width="9e99" '
        b'height="9e99"/></svg>',
        b'<svg xmlns="a" width="16" height="16"><path d="M0 0 '
        + b"L1 1 " * 3000 + b'Z"/></svg>',
        b'<svg xmlns="a" width="8" height="8"><circle r="NaN"/>'
        b'<ellipse rx="-5" ry="1e9"/><rect width="4" height="4" '
        b'transform="matrix(1e20 0 0 1e20 -1e20 0)"/></svg>',
        b'<svg xmlns="a" width="8" height="8"><use href="#x"/>'
        b'<g id="x"><use href="#x"/></g></svg>',          # use cycle
        b'<svg xmlns="a" width="8" height="8"><rect width="4" '
        b'height="4" fill="url(#none)" stroke="rgb(,,,)"/></svg>',
    ]
    for h in hostile:
        try:
            ffpic_tpu.load(h)
        except (ValueError, NotImplementedError, OSError):
            pass


def test_avif_corruption_never_crashes():
    """AVIF byte corruption must surface as a clean error or a
    (possibly wrong-pixel) decode — never a crash.  Exercises the
    native coefficient/recon paths (host_av1.c) on hostile symbol
    streams."""
    import ffpic_tpu
    path = os.path.join(CORPUS, "avif_512.avif")
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    data = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(0xA1F)
    for trial in range(20):
        d = bytearray(data)
        for _ in range(rng.integers(1, 40)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError, KeyError,
                IndexError):
            pass
