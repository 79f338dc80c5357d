"""ISOBMFF/HEIF/AVIF/BPG/JP2/SVG structure-level tests."""

import io
import os
import struct

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


def test_avif_structure(rng):
    import ffpic_tpu
    from ffpic_tpu.formats import avif
    arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "AVIF", quality=60)
    data = b.getvalue()
    codec = ffpic_tpu.probe(data)
    assert codec.name == "AVIF"
    pic = ffpic_tpu.load(data, skip_decode=True)
    assert pic.meta["width"] == 40 and pic.meta["height"] == 24
    assert "av01" in pic.meta["items"].values()
    txt = avif.info(pic)
    assert "AVIF" in txt
    sh = pic.meta.get("sequence_header")
    assert sh and sh["width"] == 40 and sh["height"] == 24
    # full pixel decode (beyond-reference; RGBA vs PIL in test_avif.py)
    pic = ffpic_tpu.load(data)
    assert pic.pixels.shape == (24, 40, 4)


def test_isobmff_box_walk(rng):
    from ffpic_tpu.formats import basemedia as bm
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "AVIF")
    data = b.getvalue()
    boxes = bm.parse_boxes(data, 0, len(data))
    types = [x.type for x in boxes]
    assert "ftyp" in types and "meta" in types and "mdat" in types
    meta = bm.find_box(boxes, "meta")
    assert bm.find_box(meta.children, "iloc") is not None
    assert bm.find_box(meta.children, "iinf") is not None
    assert bm.find_box(meta.children, "iprp/ipco") is not None


def test_heif_read_item_roundtrip(rng):
    """The HEIF structure parser runs on AVIF files too (shared meta
    machinery) — read_item must reassemble the av01 payload."""
    from ffpic_tpu.formats import heif
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "AVIF")
    data = b.getvalue()
    s = heif.parse_structure(data)
    assert s["primary"] in s["items"]
    payload = heif.read_item(data, s, s["primary"])
    assert len(payload) > 0


def test_bpg_header():
    import ffpic_tpu
    # hand-built BPG header: 4:2:0, 8-bit, 300x200
    def ue7(v):
        out = b""
        while v >= 0x80:
            out += bytes([0x80 | (v >> 7)])
            v &= 0x7F
        return out + bytes([v])
    data = b"BPG\xfb" + bytes([0x20, 0x00]) + ue7(300) + ue7(200) + ue7(10) \
        + b"\0" * 16
    pic = ffpic_tpu.load(data, skip_decode=True)
    assert pic.codec == "BPG"
    assert pic.meta["width"] == 300 and pic.meta["height"] == 200
    assert pic.meta["bit_depth"] == 8


def test_jp2_structure():
    import ffpic_tpu
    cv2 = pytest.importorskip("cv2")
    img = np.random.default_rng(2).integers(0, 256, (32, 48, 3),
                                            dtype=np.uint8)
    ok, buf = cv2.imencode(".jp2", img)
    if not ok:
        pytest.skip("cv2 lacks jp2 encoder")
    data = buf.tobytes()
    pic = ffpic_tpu.load(data, skip_decode=True)
    assert pic.codec == "JP2"
    assert pic.meta["width"] == 48 and pic.meta["height"] == 32
    assert pic.meta["components"] == 3


def test_svg_structure():
    import ffpic_tpu
    svg = (b'<?xml version="1.0"?>\n'
           b'<svg xmlns="http://www.w3.org/2000/svg" width="120" '
           b'height="80"><rect x="1" y="1" width="50" height="20"/>'
           b'<circle cx="30" cy="30" r="10"/><g><path d="M0 0L10 10"/>'
           b'</g></svg>')
    pic = ffpic_tpu.load(svg, skip_decode=True)
    assert pic.codec == "SVG"
    assert pic.meta["width"] == 120 and pic.meta["height"] == 80
    assert pic.meta["elements"]["rect"] == 1
    assert pic.meta["elements"]["path"] == 1


def test_hevc_sps_parse():
    """SPS built by hand: minimal still-picture SPS round-trips through
    the parser (field-level check of the exp-golomb layer)."""
    from ffpic_tpu.utils.bitstream import BitWriter, MSB
    from ffpic_tpu.formats import hevc
    w = BitWriter(MSB)
    w.write_bits(0x4201, 16)        # NALU header (type 33)
    w.write_bits(0, 4)              # vps id
    w.write_bits(0, 3)              # max_sub_layers - 1
    w.write_bits(1, 1)              # temporal nesting
    # PTL: 2+1+5+32+4+43+1 bits + 8 level
    w.write_bits(0, 2); w.write_bits(0, 1); w.write_bits(3, 5)
    w.write_bits(0, 32); w.write_bits(0, 4)
    for _ in range(43):
        w.write_bits(0, 1)
    w.write_bits(0, 1)
    w.write_bits(93, 8)             # level 3.1

    def ue(v):
        n = v + 1
        k = n.bit_length() - 1
        w.write_bits(0, k) if k else None
        w.write_bits(n, k + 1)

    ue(0)                           # sps id
    ue(1)                           # chroma 4:2:0
    ue(640)                         # width
    ue(480)                         # height
    w.write_bits(0, 1)              # no conformance window
    ue(0)                           # bit depth luma - 8
    ue(0)                           # bit depth chroma - 8
    ue(0)                           # log2_max_poc - 4
    w.write_bits(1, 1)              # sub_layer_ordering_info_present
    ue(1); ue(0); ue(0)
    ue(0)                           # log2_min_cb - 3
    ue(3)                           # diff max/min cb (-> CTB 64)
    ue(0)                           # log2_min_tb - 2
    ue(3)
    ue(0); ue(0)
    w.write_bits(0, 1)              # scaling list
    w.write_bits(0, 1)              # amp
    w.write_bits(1, 1)              # sao
    w.write_bits(0, 1)              # pcm
    ue(0)                           # num_short_term_rps
    w.align_byte(fill=0)
    sps = hevc.parse_sps(w.getvalue())
    assert sps.width == 640 and sps.height == 480
    assert sps.chroma_format == 1
    assert sps.bit_depth_luma == 8
    assert 1 << sps.ctb_log2 == 64
    assert sps.sample_adaptive_offset
    assert sps.ptl.profile_idc == 3


def test_truncated_files_raise_valueerror(tmp_path):
    """Malformed files that pass probe must surface as ValueError, not
    raw struct.error/KeyError/IndexError tracebacks (registry wraps)."""
    import ffpic_tpu
    corpus = os.path.join(REPO, "corpus")
    for name, cut in [("gif_512.gif", 50), ("png_512_rgb.png", 60),
                      ("webp_512.webp", 40), ("bmp_512.bmp", 30)]:
        src = os.path.join(corpus, name)
        if not os.path.exists(src):
            continue
        p = tmp_path / ("t_" + name)
        p.write_bytes(open(src, "rb").read()[:cut])
        with pytest.raises((ValueError, NotImplementedError)):
            ffpic_tpu.load(str(p))


def _exif_app1(orientation, bo="<"):
    """Minimal EXIF APP1 segment: TIFF header + IFD0 with orientation,
    make, and an ExifIFD holding pixel_x."""
    import struct
    e = "<" if bo == "<" else ">"
    make = b"ffpictest\0"
    # layout: hdr(8) ifd0(2+3*12+4=42 @8) make str @50, exififd @60
    ifd0 = struct.pack(e + "H", 3)
    ifd0 += struct.pack(e + "HHI", 0x010F, 2, len(make)) + \
        struct.pack(e + "I", 50)
    ifd0 += struct.pack(e + "HHIHH", 0x0112, 3, 1, orientation, 0)
    ifd0 += struct.pack(e + "HHII", 0x8769, 4, 1, 60)
    ifd0 += struct.pack(e + "I", 0)
    exif_ifd = struct.pack(e + "H", 1) + \
        struct.pack(e + "HHII", 0xA002, 4, 1, 512) + \
        struct.pack(e + "I", 0)
    tiff = (b"II*\0" if bo == "<" else b"MM\0*") + \
        struct.pack(e + "I", 8) + ifd0 + make + exif_ifd
    payload = b"Exif\0\0" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload


@pytest.mark.parametrize("bo", ["<", ">"])
def test_jpeg_exif_parse(bo):
    import ffpic_tpu
    path = os.path.join(CORPUS, "jpeg_512_420.jpg")
    data = open(path, "rb").read()
    patched = data[:2] + _exif_app1(6, bo) + data[2:]
    pic = ffpic_tpu.load(patched)
    ex = pic.meta["exif"]
    assert ex["orientation"] == 6
    assert ex["make"] == "ffpictest"
    assert ex["pixel_x"] == 512
    from ffpic_tpu.formats import jpg
    assert "EXIF:" in jpg.info(pic)
    # pixels themselves are untouched (decoders never auto-rotate)
    base = ffpic_tpu.load(data)
    np.testing.assert_array_equal(pic.np_pixels(), base.np_pixels())


@pytest.mark.parametrize("orientation", range(1, 9))
def test_exif_transpose_matches_pil(orientation):
    from PIL import Image, ImageOps
    from ffpic_tpu.formats.pic import Pic
    rng = np.random.default_rng(orientation)
    arr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    im = Image.fromarray(arr)
    ex = im.getexif()
    ex[0x0112] = orientation
    want = np.asarray(ImageOps.exif_transpose(im))

    rgba = np.concatenate([arr, np.full((6, 9, 1), 255, np.uint8)], -1)
    pic = Pic(pixels=rgba, width=9, height=6, depth=32, pitch=36,
              codec="JPG", meta={"exif": {"orientation": orientation}})
    out = pic.exif_transpose()
    np.testing.assert_array_equal(out.np_pixels()[..., :3], want)
    assert (out.width, out.height) == (want.shape[1], want.shape[0])
    assert out.meta["exif"]["orientation"] == 1
