"""PNG decode tests: vs PIL across color types / bit depths /
interlacing, filter-path differential tests (Python oracle vs C vs
device scan kernel), and inflate differential vs zlib."""

import io
import os
import sys
import zlib

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


def _png_bytes(img: Image.Image, **kw) -> bytes:
    b = io.BytesIO()
    img.save(b, "PNG", **kw)
    return b.getvalue()


def _decode_ours(data: bytes):
    from ffpic_tpu.formats import png
    return png.load(data)[0]


def _rand_rgba(rng, h, w):
    return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)


@pytest.mark.parametrize("mode,ct", [
    ("RGB", 2), ("RGBA", 6), ("L", 0), ("LA", 4), ("P", 3), ("1", 0),
])
def test_png_modes_vs_pil(rng, mode, ct):
    arr = _rand_rgba(rng, 40, 56)
    # smooth it a bit so palette quantization is stable
    img = Image.fromarray(arr[..., :3]).convert(mode)
    data = _png_bytes(img)
    pic = _decode_ours(data)
    want = np.array(img.convert("RGBA"))
    got = pic.to_rgba32()
    np.testing.assert_array_equal(got, want)


def test_png_16bit_gray(rng):
    a16 = rng.integers(0, 65536, (20, 30), dtype=np.uint16)
    img = Image.fromarray(a16, mode="I;16")
    data = _png_bytes(img)
    pic = _decode_ours(data)
    # PIL writes 16-bit little... PNG is big-endian; our 8-bit view is >>8
    assert pic.meta["bitdepth"] == 16
    np.testing.assert_array_equal(pic.to_rgba32()[..., 0],
                                  (a16 >> 8).astype(np.uint8))


def _write_adam7_png(arr: np.ndarray) -> bytes:
    """Hand-rolled Adam7 interlaced RGBA writer (filter 0 rows)."""
    import struct
    from ffpic_tpu.utils.checksum import crc32
    from ffpic_tpu.formats.png import ADAM7, SIGNATURE
    h, w = arr.shape[:2]
    raw = bytearray()
    for (x0, y0, dx, dy) in ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw += row.tobytes()
    comp = zlib.compress(bytes(raw))

    def chunk(name, payload):
        return struct.pack(">I", len(payload)) + name + payload + \
            struct.pack(">I", crc32(name + payload))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 1)
    return (SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) +
            chunk(b"IEND", b""))


def test_png_adam7_deinterlace(rng):
    arr = _rand_rgba(rng, 37, 41)
    data = _write_adam7_png(arr)
    # PIL agrees the file is valid Adam7
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(pil, arr)
    pic = _decode_ours(data)
    np.testing.assert_array_equal(pic.to_rgba32(), arr)


def test_unfilter_paths_agree(rng):
    """Python oracle vs native C vs device scan-kernel on the
    sub/up-only subset; oracle vs C on all five filters."""
    from ffpic_tpu.formats.png import _unfilter_py
    from ffpic_tpu import native
    h, stride, bpp = 23, 61, 3
    raw = rng.integers(0, 256, h * (stride + 1), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    raw[:, 0] = rng.integers(0, 5, h)   # all five filters
    flat = raw.reshape(-1)
    want = _unfilter_py(flat, h, stride, bpp)
    if native.available():
        got = native.png_unfilter(flat, h, stride, bpp)
        np.testing.assert_array_equal(got, want)

    raw[:, 0] = rng.integers(0, 3, h)   # {None, Sub, Up} only
    flat = raw.reshape(-1)
    want = _unfilter_py(flat, h, stride, bpp)
    import jax.numpy as jnp
    from ffpic_tpu.ops.png_kernels import unfilter_device_subup
    got = np.asarray(unfilter_device_subup(
        jnp.asarray(raw[:, 1:]), jnp.asarray(raw[:, 0].astype(np.int32)),
        bpp=bpp))
    np.testing.assert_array_equal(got, want)


def test_inflate_differential_vs_zlib(rng):
    from ffpic_tpu.coding.deflate import inflate
    for size, level in [(100, 1), (5000, 6), (200, 9), (0, 6)]:
        # compressible data with repeats
        base = rng.integers(0, 50, size // 2 + 1, dtype=np.uint8).tobytes()
        data = (base * 3)[:size]
        comp = zlib.compress(data, level)
        assert inflate(comp) == data


def test_inflate_stored_blocks():
    from ffpic_tpu.coding.deflate import inflate
    data = b"hello stored world" * 3
    comp = zlib.compress(data, 0)
    assert inflate(comp) == data


def test_png_encoder_roundtrip(rng):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    arr = _rand_rgba(rng, 33, 47)
    pic = Pic(pixels=arr, width=47, height=33, format="RGBA32", codec="PNG")
    data = ffpic_tpu.encode(pic, "PNG")
    # PIL reads it
    np.testing.assert_array_equal(
        np.array(Image.open(io.BytesIO(data)).convert("RGBA")), arr)
    # we read it
    np.testing.assert_array_equal(_decode_ours(data).to_rgba32(), arr)


@pytest.mark.skipif(not os.path.isdir(CORPUS), reason="corpus missing")
def test_png_corpus_1080p():
    path = os.path.join(CORPUS, "png_1080p_rgba.png")
    pic = _decode_ours(open(path, "rb").read())
    want = np.array(Image.open(path).convert("RGBA"))
    np.testing.assert_array_equal(pic.to_rgba32(), want)


def test_png_adaptive_filtering_compresses_and_roundtrips():
    """Encoder picks per-row filters (None/Sub/Up/Avg/Paeth): smooth
    content must compress far better than filter-None, and both PIL
    and our decoder must roundtrip byte-exact."""
    import io
    import zlib
    from PIL import Image
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic

    grad = (np.add.outer(np.arange(128), np.arange(128)) % 256)
    rgba = np.stack([grad, grad[::-1], grad.T,
                     np.full((128, 128), 255)], -1).astype(np.uint8)
    pic = Pic(pixels=rgba, width=128, height=128, depth=32,
              pitch=512, codec="raw")
    data = ffpic_tpu.encode(pic, "png")

    none_rows = np.zeros((128, 513), np.uint8)
    none_rows[:, 1:] = rgba.reshape(128, -1)
    none_size = len(zlib.compress(none_rows.tobytes(), 6))
    assert len(data) < none_size // 2      # filters must pay off

    out = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
    np.testing.assert_array_equal(out, rgba)
    np.testing.assert_array_equal(ffpic_tpu.load(data).np_pixels(),
                                  rgba)
