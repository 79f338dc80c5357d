"""TIFF/EXR/PSD decode tests vs PIL/cv2-generated files."""

import io
import os
import struct

import numpy as np
import pytest
from PIL import Image


def _save(img, fmt, **kw):
    b = io.BytesIO()
    img.save(b, fmt, **kw)
    return b.getvalue()


def _ours(data):
    import ffpic_tpu
    return ffpic_tpu.load(data)


# ---------------- TIFF ------------------------------------------------

@pytest.mark.parametrize("compression", [None, "tiff_lzw", "packbits",
                                         "tiff_deflate"])
def test_tiff_rgb(rng, compression):
    arr = rng.integers(0, 256, (23, 37, 3), dtype=np.uint8)
    kw = {"compression": compression} if compression else {}
    data = _save(Image.fromarray(arr), "TIFF", **kw)
    pic = _ours(data)
    assert pic.codec == "TIFF"
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)


def test_tiff_gray_and_bilevel(rng):
    g = rng.integers(0, 256, (15, 21), dtype=np.uint8)
    pic = _ours(_save(Image.fromarray(g), "TIFF"))
    np.testing.assert_array_equal(pic.to_rgba32()[..., 0], g)
    bl = Image.fromarray(g).convert("1")
    pic = _ours(_save(bl, "TIFF"))
    np.testing.assert_array_equal(pic.to_rgba32()[..., 0],
                                  np.array(bl.convert("L")))


def test_tiff_multipage(rng):
    imgs = [Image.fromarray(rng.integers(0, 256, (10, 12, 3),
                                         dtype=np.uint8)) for _ in range(3)]
    b = io.BytesIO()
    imgs[0].save(b, "TIFF", save_all=True, append_images=imgs[1:])
    pic = _ours(b.getvalue())
    assert pic.n_frames == 3
    for i, fr in enumerate([pic] + pic.frames):
        np.testing.assert_array_equal(fr.to_rgba32()[..., :3],
                                      np.array(imgs[i]))


def test_tiff_lzw_predictor(rng):
    # smooth data so the predictor actually engages
    arr = np.cumsum(rng.integers(0, 3, (20, 30, 3)), axis=1) \
        .astype(np.uint8)
    img = Image.fromarray(arr)
    b = io.BytesIO()
    # PIL enables predictor via tiffinfo
    img.save(b, "TIFF", compression="tiff_lzw",
             tiffinfo={317: 2})
    pic = _ours(b.getvalue())
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)


# ---------------- EXR (via cv2) --------------------------------------

def _cv2():
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    try:
        import cv2
        return cv2
    except ImportError:
        return None


def _write_exr_half(rgb: np.ndarray, compression: int = 0) -> bytes:
    """Minimal scanline EXR writer (half RGB, ZIPS or none) used as the
    test vector source — no EXR writer exists in this image."""
    import zlib
    h, w = rgb.shape[:2]

    def attr(name, typ, payload):
        return (name.encode() + b"\0" + typ.encode() + b"\0" +
                struct.pack("<I", len(payload)) + payload)

    chan = b""
    for n in (b"B", b"G", b"R"):
        chan += n + b"\0" + struct.pack("<IBBBBII", 1, 0, 0, 0, 0, 1, 1)
    chan += b"\0"
    dw = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    hdr = (attr("channels", "chlist", chan) +
           attr("compression", "compression", bytes([compression])) +
           attr("dataWindow", "box2i", dw) +
           attr("displayWindow", "box2i", dw) +
           attr("lineOrder", "lineOrder", b"\0") +
           attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)) +
           attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0)) +
           attr("screenWindowWidth", "float", struct.pack("<f", 1.0)) +
           b"\0")
    out = bytearray(b"\x76\x2f\x31\x01" + struct.pack("<I", 2) + hdr)
    table_pos = len(out)
    out += b"\0" * 8 * h
    offsets = []
    half = rgb.astype(np.float16)
    for y in range(h):
        offsets.append(len(out))
        # channels sorted by name: B, G, R
        raw = (half[y, :, 2].tobytes() + half[y, :, 1].tobytes() +
               half[y, :, 0].tobytes())
        if compression == 2:  # ZIPS: interleave + delta + zlib
            a = np.frombuffer(raw, np.uint8)
            n = len(a)
            hl = (n + 1) // 2
            inter = np.empty(n, np.uint8)
            inter[:hl] = a[0::2]
            inter[hl:] = a[1::2]
            d = inter.astype(np.int16)
            d[1:] = ((d[1:] - d[:-1].astype(np.int16)) + 128) & 255
            payload = zlib.compress(d.astype(np.uint8).tobytes())
            if len(payload) >= len(raw):
                payload = raw  # spec allows storing uncompressed
        else:
            payload = raw
        out += struct.pack("<iI", y, len(payload)) + payload
    struct.pack_into(f"<{h}Q", out, table_pos, *offsets)
    return bytes(out)


@pytest.mark.parametrize("compression", [0, 2])
def test_exr_scanline_half(compression):
    rng = np.random.default_rng(3)
    rgb = rng.random((17, 25, 3), dtype=np.float32)
    data = _write_exr_half(rgb, compression)
    pic = _ours(data)
    assert pic.codec == "EXR"
    from ffpic_tpu.formats.exr import _linear_to_srgb
    want = np.clip(_linear_to_srgb(rgb.astype(np.float16).astype(np.float32))
                   * 255 + 0.5, 0, 255).astype(np.uint8)
    got = pic.to_rgba32()[..., :3]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


# ---------------- PSD -------------------------------------------------

def test_psd_rgb(rng):
    arr = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    cv2 = _cv2()
    # PIL cannot write PSD; craft a minimal uncompressed one by hand
    h, w = arr.shape[:2]
    hdr = struct.pack(">4sH6sHIIHH", b"8BPS", 1, b"\0" * 6, 3, h, w, 8, 3)
    body = struct.pack(">I", 0) + struct.pack(">I", 0) + struct.pack(">I", 0)
    img = struct.pack(">H", 0) + arr[..., 0].tobytes() + \
        arr[..., 1].tobytes() + arr[..., 2].tobytes()
    data = hdr + body + img
    pic = _ours(data)
    assert pic.codec == "PSD"
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)
    # PIL can *read* PSD: cross-check
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], pil)


def test_psd_rle_via_pil_written_file(rng):
    # validate our RLE reader against PIL's PSD reader on a PIL-readable
    # RLE stream we synthesize (PackBits rows)
    h, w = 5, 9
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    def packrow(row):
        return bytes([len(row) - 1]) + row.tobytes()  # literal run

    chans = []
    counts = []
    for c in range(3):
        rows = [packrow(arr[y, :, c]) for y in range(h)]
        counts += [len(r) for r in rows]
        chans.append(b"".join(rows))
    hdr = struct.pack(">4sH6sHIIHH", b"8BPS", 1, b"\0" * 6, 3, h, w, 8, 3)
    body = struct.pack(">I", 0) * 3
    img = struct.pack(">H", 1) + \
        b"".join(struct.pack(">H", c) for c in counts) + b"".join(chans)
    data = hdr + body + img
    pic = _ours(data)
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], pil)
