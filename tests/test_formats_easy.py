"""PNM/TGA/GIF/ICO decode tests vs PIL."""

import io
import os
import struct

import numpy as np
import pytest
from PIL import Image

import ffpic_tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


def _save(img, fmt, **kw):
    b = io.BytesIO()
    img.save(b, fmt, **kw)
    return b.getvalue()


def _ours(data):
    import ffpic_tpu
    return ffpic_tpu.load(data)


# ---------------- PNM -------------------------------------------------

@pytest.mark.parametrize("mode", ["RGB", "L", "1"])
def test_pnm_binary_vs_pil(rng, mode):
    arr = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    img = Image.fromarray(arr).convert(mode)
    data = _save(img, "PPM")
    pic = _ours(data)
    assert pic.codec == "PNM"
    np.testing.assert_array_equal(pic.to_rgba32(),
                                  np.array(img.convert("RGBA")))


def test_pnm_ascii():
    data = b"P2\n# comment\n3 2\n15\n0 5 10\n15 3 7\n"
    pic = _ours(data)
    want = (np.array([[0, 5, 10], [15, 3, 7]]) * 255 / 15 + 0.5).astype(int)
    np.testing.assert_array_equal(pic.to_rgba32()[..., 0], want)


def test_pam_rgba(rng):
    arr = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    hdr = (f"P7\nWIDTH 11\nHEIGHT 9\nDEPTH 4\nMAXVAL 255\n"
           f"TUPLTYPE RGB_ALPHA\nENDHDR\n").encode()
    pic = _ours(hdr + arr.tobytes())
    np.testing.assert_array_equal(pic.to_rgba32(), arr)


# ---------------- TGA -------------------------------------------------

def test_tga_truecolor_vs_pil(rng):
    arr = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    data = _save(Image.fromarray(arr), "TGA")
    pic = _ours(data)
    assert pic.codec == "TGA"
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)


def test_tga_rle_vs_pil(rng):
    arr = np.zeros((16, 16, 3), np.uint8)
    arr[4:12, :] = [200, 30, 90]   # runs compress well
    data = _save(Image.fromarray(arr), "TGA", compression="tga_rle")
    pic = _ours(data)
    np.testing.assert_array_equal(pic.to_rgba32()[..., :3], arr)


def test_tga_encoder_roundtrip(rng):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    arr = rng.integers(0, 256, (13, 19, 4), dtype=np.uint8)
    data = ffpic_tpu.encode(
        Pic(pixels=arr, width=19, height=13, format="RGBA32"), "TGA")
    np.testing.assert_array_equal(
        np.array(Image.open(io.BytesIO(data)).convert("RGBA")), arr)


# ---------------- GIF -------------------------------------------------

def test_gif_static_vs_pil(rng):
    arr = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    img = Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE)
    data = _save(img, "GIF")
    pic = _ours(data)
    assert pic.codec == "GIF"
    np.testing.assert_array_equal(pic.to_rgba32(),
                                  np.array(img.convert("RGBA")))


def test_gif_animation_frames(rng):
    frames = [Image.fromarray(
        np.full((8, 8, 3), c, np.uint8)).convert("P") for c in (10, 120, 240)]
    b = io.BytesIO()
    frames[0].save(b, "GIF", save_all=True, append_images=frames[1:],
                   duration=50, loop=2)
    pic = _ours(b.getvalue())
    assert pic.n_frames == 3
    assert pic.meta.get("loops") == 2
    assert pic.delay_ms == 50
    pil = Image.open(io.BytesIO(b.getvalue()))
    for i, fr in enumerate([pic] + pic.frames):
        pil.seek(i)
        np.testing.assert_array_equal(fr.to_rgba32(),
                                      np.array(pil.convert("RGBA")))


@pytest.mark.skipif(not os.path.isdir(CORPUS), reason="corpus missing")
def test_gif_corpus():
    path = os.path.join(CORPUS, "gif_512.gif")
    pic = _ours(open(path, "rb").read())
    want = np.array(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(pic.to_rgba32(), want)


# ---------------- ICO -------------------------------------------------

def test_ico_vs_pil(rng):
    arr = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    img = Image.fromarray(arr)
    data = _save(img, "ICO", sizes=[(32, 32)])
    pic = _ours(data)
    assert pic.codec == "ICO"
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(pic.to_rgba32(), pil)


# ---------------- LZW unit --------------------------------------------

def test_lzw_tiff_via_pil(rng):
    arr = rng.integers(0, 200, (16, 24, 3), dtype=np.uint8)
    data = _save(Image.fromarray(arr), "TIFF", compression="tiff_lzw")
    # decoded later by our TIFF codec test; here just ensure our LZW
    # decodes PIL's GIF LZW streams (covered in gif tests) — placeholder
    assert data[:2] in (b"II", b"MM")


def test_gif_encoder_lossless_roundtrip(rng):
    """<=256-color content roundtrips losslessly through our encoder,
    verified by BOTH PIL and our own decoder (format/gif.c has no
    encoder)."""
    import io
    from PIL import Image
    from ffpic_tpu.formats.pic import Pic
    base = np.kron(rng.integers(0, 5, (8, 8)),
                   np.ones((16, 16))).astype(np.uint8) * 50
    rgba = np.stack([base, base // 2, 255 - base,
                     np.full_like(base, 255)], -1)
    pic = Pic(pixels=rgba, width=128, height=128, depth=32, pitch=512,
              codec="raw")
    g = ffpic_tpu.encode(pic, "gif")
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(g)).convert("RGBA")), rgba)
    np.testing.assert_array_equal(ffpic_tpu.load(g).np_pixels(), rgba)


def test_gif_encoder_quantize_transparency_animation(rng):
    import io
    from PIL import Image
    from ffpic_tpu.formats.pic import Pic
    # >256 colors: median-cut quantization keeps PSNR sane
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    rgba = np.concatenate([img, np.full((64, 64, 1), 255, np.uint8)],
                          -1)
    g = ffpic_tpu.encode(Pic(pixels=rgba, width=64, height=64,
                             depth=32, pitch=256, codec="raw"), "gif")
    got = np.asarray(Image.open(io.BytesIO(g)).convert("RGB"))
    err = (got.astype(float) - img.astype(float)) ** 2
    assert 10 * np.log10(255 ** 2 / err.mean()) > 20

    # transparency maps to a GIF transparent index
    rgba_t = rgba.copy()
    rgba_t[:32, :, 3] = 0
    g = ffpic_tpu.encode(Pic(pixels=rgba_t, width=64, height=64,
                             depth=32, pitch=256, codec="raw"), "gif")
    a = np.asarray(Image.open(io.BytesIO(g)).convert("RGBA"))[..., 3]
    assert (a[:32] == 0).all() and (a[32:] == 255).all()

    # animation: frames + delays + NETSCAPE loop
    frames = [Pic(pixels=np.roll(rgba, 16 * k, axis=1), width=64,
                  height=64, depth=32, pitch=256, codec="raw",
                  delay_ms=40) for k in (1, 2)]
    anim = Pic(pixels=rgba, width=64, height=64, depth=32, pitch=256,
               codec="raw", frames=frames, delay_ms=40)
    g = ffpic_tpu.encode(anim, "gif", loops=0)
    im = Image.open(io.BytesIO(g))
    assert im.n_frames == 3
    assert im.info.get("duration") == 40
    back = ffpic_tpu.load(g)
    assert 1 + len(back.frames or []) == 3


def test_gif_lzw_encode_differential(rng):
    """Encoder LZW vs the native decoder across code-size growth and
    the clear-on-full path."""
    from ffpic_tpu.formats.gif import _lzw_encode_gif
    from ffpic_tpu import native
    if not native.available():
        pytest.skip("native unavailable")
    for n, maxsym in [(1, 4), (3, 2), (1000, 4), (40000, 256),
                      (300000, 3)]:
        idx = rng.integers(0, maxsym, n).astype(np.int32)
        mcs = max(2, int(np.ceil(np.log2(max(maxsym, 2)))))
        enc = _lzw_encode_gif(idx, mcs)
        dec = np.frombuffer(native.lzw_gif(enc, mcs, n), np.uint8)
        np.testing.assert_array_equal(dec.astype(np.int32), idx)
