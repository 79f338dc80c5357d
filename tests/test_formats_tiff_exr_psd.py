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


def test_tiff_tiled(tmp_path):
    """Hand-built tiled TIFF (PIL writes strips only): 2x2 tiles of
    16x16, uncompressed RGB."""
    import struct as st
    rng = np.random.default_rng(7)
    W = H = 24
    TW = TH = 16
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    tiles = []
    for ty in range(2):
        for tx in range(2):
            t = np.zeros((TH, TW, 3), np.uint8)
            sub = img[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW]
            t[:sub.shape[0], :sub.shape[1]] = sub
            tiles.append(t.tobytes())
    # IFD
    hdr = b"II*\x00" + st.pack("<I", 8)
    ntags = 10
    ifd_off = 8
    data_off = ifd_off + 2 + ntags * 12 + 4
    bps_off = data_off
    t_off_off = bps_off + 6
    t_cnt_off = t_off_off + 16
    tile_data_off = t_cnt_off + 16
    entries = []
    def tag(tid, typ, cnt, val):
        entries.append(st.pack("<HHI4s", tid, typ, cnt, val))
    tag(256, 3, 1, st.pack("<HH", W, 0))          # width
    tag(257, 3, 1, st.pack("<HH", H, 0))          # height
    tag(258, 3, 3, st.pack("<I", bps_off))        # bits per sample
    tag(259, 3, 1, st.pack("<HH", 1, 0))          # compression none
    tag(262, 3, 1, st.pack("<HH", 2, 0))          # RGB
    tag(277, 3, 1, st.pack("<HH", 3, 0))          # spp
    tag(322, 3, 1, st.pack("<HH", TW, 0))         # tile width
    tag(323, 3, 1, st.pack("<HH", TH, 0))         # tile length
    tag(324, 4, 4, st.pack("<I", t_off_off))      # tile offsets
    tag(325, 4, 4, st.pack("<I", t_cnt_off))      # tile byte counts
    ifd = st.pack("<H", ntags) + b"".join(entries) + st.pack("<I", 0)
    body = st.pack("<HHH", 8, 8, 8)
    offs = []
    pos = tile_data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    body += st.pack("<4I", *offs)
    body += st.pack("<4I", *(len(t) for t in tiles))
    blob = hdr + ifd + body + b"".join(tiles)
    p = tmp_path / "tiled.tif"
    p.write_bytes(blob)
    import ffpic_tpu
    pic = ffpic_tpu.load(str(p))
    out = pic.np_pixels()[:, :, :3]
    np.testing.assert_array_equal(out, img)


def test_exr_rle(tmp_path):
    """Hand-encoded RLE EXR scanlines decode exactly (the reference
    reads only uncompressed EXR)."""
    from ffpic_tpu.formats import exr as exr_mod

    def rle_encode(raw: bytes) -> bytes:
        # simple encoder: runs of >=3 as repeats, else literals
        out = bytearray()
        i = 0
        n = len(raw)
        while i < n:
            run = 1
            while i + run < n and raw[i + run] == raw[i] and run < 127:
                run += 1
            if run >= 3:
                out.append(run - 1)
                out.append(raw[i])
                i += run
            else:
                lit = i
                while (i < n and i - lit < 127
                       and not (i + 2 < n and raw[i] == raw[i + 1]
                                == raw[i + 2])):
                    i += 1
                out.append(256 - (i - lit))
                out += raw[lit:i]
        return bytes(out)

    # EXR "reconstruct" transform inverse: interleave + delta-encode
    def zip_forward(raw: bytes) -> bytes:
        arr = np.frombuffer(raw, np.uint8)
        half = (len(arr) + 1) // 2
        inter = np.zeros_like(arr)
        inter[0::2] = arr[:half]
        inter[1::2] = arr[half:half + len(arr) // 2]
        out = inter.astype(np.int32).copy()
        out[1:] = (inter[1:].astype(np.int32)
                   - inter[:-1].astype(np.int32) + 128 + 256) % 256
        return bytes(out.astype(np.uint8))

    rng = np.random.default_rng(3)
    W, H = 16, 8
    vals = (rng.random((H, W)).astype(np.float32) * 4).round() / 4
    import struct as st
    hdr = b"\x76\x2f\x31\x01" + st.pack("<I", 2)
    def attr(name, typ, payload):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + st.pack("<I", len(payload)) + payload)
    chan = b"G\0" + st.pack("<i", 2) + b"\0\0\0\0" + st.pack("<ii", 1, 1)
    chans = chan + b"\0"
    body = attr("channels", "chlist", chans)
    body += attr("compression", "compression", b"\x01")   # RLE
    body += attr("dataWindow", "box2i", st.pack("<4i", 0, 0, W - 1,
                                                H - 1))
    body += attr("displayWindow", "box2i", st.pack("<4i", 0, 0, W - 1,
                                                   H - 1))
    body += attr("lineOrder", "lineOrder", b"\x00")
    body += attr("pixelAspectRatio", "float", st.pack("<f", 1.0))
    body += attr("screenWindowCenter", "v2f", st.pack("<ff", 0, 0))
    body += attr("screenWindowWidth", "float", st.pack("<f", 1.0))
    body += b"\0"
    table_pos = len(hdr) + len(body)
    blocks = []
    offs = []
    pos = table_pos + 8 * H
    for y in range(H):
        raw = vals[y].astype("<f4").tobytes()
        enc = rle_encode(zip_forward(raw))
        if len(enc) >= len(raw):
            enc = raw
        blk = st.pack("<iI", y, len(enc)) + enc
        offs.append(pos)
        blocks.append(blk)
        pos += len(blk)
    blob = (hdr + body + st.pack(f"<{H}Q", *offs) + b"".join(blocks))
    p = tmp_path / "rle.exr"
    p.write_bytes(blob)
    import ffpic_tpu
    pic = ffpic_tpu.load(str(p))
    assert pic.meta["compression"] == 1
    assert pic.np_pixels().shape == (H, W, 4)


def test_tiff_jpeg_compression_vs_pil(rng):
    """JPEG-in-TIFF (compression 7 + JPEGTables tag 347): PIL writes
    it, both decoders must agree within JPEG color-convert rounding."""
    import io
    from PIL import Image
    import ffpic_tpu
    arr = np.kron(rng.integers(0, 256, (8, 8, 3)),
                  np.ones((16, 16, 1))).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "TIFF", compression="jpeg", quality=90)
    data = b.getvalue()
    ours = ffpic_tpu.load(data).np_pixels()[..., :3].astype(int)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")) \
        .astype(int)
    assert np.abs(ours - pil).max() <= 1

    gb = io.BytesIO()
    Image.fromarray(arr[..., 0]).save(gb, "TIFF", compression="jpeg",
                                      quality=85)
    ours_g = ffpic_tpu.load(gb.getvalue()).np_pixels()[..., 0] \
        .astype(int)
    pil_g = np.asarray(Image.open(gb).convert("L")).astype(int)
    assert np.abs(ours_g - pil_g).max() <= 1

    # width not a multiple of the JPEG MCU: the embedded decoder pads
    # rows to align8, which must be cropped per strip or every row
    # after the first is skewed (advisor round-2 finding)
    narrow = arr[:96, :100]
    nb = io.BytesIO()
    Image.fromarray(narrow).save(nb, "TIFF", compression="jpeg",
                                 quality=90)
    ours_n = ffpic_tpu.load(nb.getvalue()).np_pixels()[..., :3] \
        .astype(int)
    pil_n = np.asarray(Image.open(nb).convert("RGB")).astype(int)
    assert np.abs(ours_n - pil_n).max() <= 1
