"""WebP/VP8 decode tests: pixel-exact against libwebp (via PIL)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


def _roundtrip(arr, q=75, **save_kw):
    from ffpic_tpu.formats import webp as W
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=False, quality=q,
                              method=4, **save_kw)
    data = b.getvalue()
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    pil = np.array(Image.open(io.BytesIO(data)).convert(mode))
    ours = W.load(data)[0].to_rgba32()[..., :arr.shape[-1]]
    return ours, pil


def test_vp8_flat_exact():
    arr = np.full((32, 32, 3), 137, np.uint8)
    ours, pil = _roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


def test_vp8_noise_exact(rng):
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    ours, pil = _roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


def test_vp8_gradient_exact():
    yy, xx = np.mgrid[0:48, 0:64]
    arr = np.stack([(xx * 4) % 256, (yy * 5) % 256,
                    ((xx + yy) * 3) % 256], axis=-1).astype(np.uint8)
    ours, pil = _roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


@pytest.mark.parametrize("q", [20, 92])
def test_vp8_alpha_odd_size_exact(rng, q):
    arr = rng.integers(0, 256, (37, 53, 4), dtype=np.uint8)
    ours, pil = _roundtrip(arr, q=q)
    np.testing.assert_array_equal(ours, pil)


def test_vp8_photo_like_exact(rng):
    # smooth content exercising segmentation/filters at moderate size
    yy, xx = np.mgrid[0:96, 0:112].astype(np.float32)
    arr = np.stack([
        128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 13.0),
        128 + 80 * np.cos(xx / 7.0 + yy / 21.0),
        128 + 110 * np.sin((xx + yy) / 23.0),
    ], axis=-1)
    arr = np.clip(arr + rng.normal(0, 8, arr.shape), 0, 255).astype(np.uint8)
    ours, pil = _roundtrip(arr, q=60)
    np.testing.assert_array_equal(ours, pil)


def test_webp_skip_decode_and_info(rng):
    from ffpic_tpu.formats import webp as W
    arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=False, quality=75)
    pic = W.load(b.getvalue(), skip_decode=True)[0]
    assert pic.meta["width"] == 40 and pic.meta["height"] == 24
    assert "VP8 " in pic.meta["chunks"]
    assert "lossy" in W.info(pic)


def _lossless_roundtrip(arr, **kw):
    from ffpic_tpu.formats import webp as W
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=True, **kw)
    data = b.getvalue()
    mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
    pil = np.array(Image.open(io.BytesIO(data)).convert(mode))
    ours = W.load(data)[0].to_rgba32()[..., :arr.shape[-1]]
    return ours, pil


def test_vp8l_lossless_exact(rng):
    arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    ours, pil = _lossless_roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


def test_vp8l_rgba_exact(rng):
    arr = rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    ours, pil = _lossless_roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


@pytest.mark.parametrize("ncolors,mult", [(2, 255), (4, 85), (14, 18)])
def test_vp8l_palette_packing_exact(rng, ncolors, mult):
    # small palettes trigger color-indexing with sub-byte pixel packing
    idx = (rng.integers(0, ncolors, (25, 37)) * mult).astype(np.uint8)
    arr = np.stack([idx, 255 - idx, idx // 2], axis=-1)
    ours, pil = _lossless_roundtrip(arr)
    np.testing.assert_array_equal(ours, pil)


def test_vp8l_photo_transforms_exact(rng):
    # method 6 engages predictor/color transforms + meta huffman groups
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    arr = np.stack([128 + 90 * np.sin(xx / 19) * np.cos(yy / 13),
                    128 + 70 * np.cos(xx / 9 + yy / 23),
                    128 + 100 * np.sin((xx + yy) / 29)], axis=-1)
    arr = np.clip(arr + rng.normal(0, 6, arr.shape), 0, 255).astype(np.uint8)
    ours, pil = _lossless_roundtrip(arr, method=6, quality=100)
    np.testing.assert_array_equal(ours, pil)


def test_vp8_odd_size_edge_upsampling_exact(rng):
    # non-multiple-of-16 dims: border chroma must blend edge-replicated
    # valid samples, not MB padding
    arr = rng.integers(0, 256, (30, 20, 3), dtype=np.uint8)
    from ffpic_tpu.formats import webp as W
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=False, quality=75)
    pil = np.array(Image.open(io.BytesIO(b.getvalue())).convert("RGB"))
    ours = W.load(b.getvalue())[0].to_rgba32()[..., :3]
    np.testing.assert_array_equal(ours, pil)


def test_registry_probe_webp(rng):
    import ffpic_tpu
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=False)
    assert ffpic_tpu.probe(b.getvalue()).name == "WEBP"


def test_vp8_device_kernels_match_golden(rng):
    """ops/vp8_kernels (device) vs ops/golden (numpy) bit-exact."""
    import numpy as np
    from ffpic_tpu.ops import golden, vp8_kernels as vk
    blocks = rng.integers(-2000, 2000, (3, 4, 25, 4, 4)).astype(np.int16)
    np.testing.assert_array_equal(
        np.asarray(vk.vp8_idct4x4(blocks)), golden.vp8_idct4x4(blocks))
    np.testing.assert_array_equal(
        np.asarray(vk.vp8_iwht4x4(blocks[..., 0, :, :])),
        golden.vp8_iwht4x4(blocks[..., 0, :, :]))


def test_vp8_device_residuals_match_numpy(tmp_path, rng):
    """Full residual stage: FFPIC_VP8_DEVICE path == numpy path on the
    corpus WebP."""
    import os
    import numpy as np
    import struct as st
    from ffpic_tpu.formats.vp8 import VP8Decoder
    path = os.path.join(REPO, "corpus", "webp_512.webp")
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    data = open(path, "rb").read()
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = st.unpack_from("<I", data, pos + 4)[0]
        if tag == b"VP8 ":
            vp8 = data[pos + 8:pos + 8 + size]
            break
        pos += 8 + size + (size & 1)

    def residuals(device):
        d = VP8Decoder(vp8)
        d._parse_control_partition()
        d._dequant_tables()
        d._parse_mb_headers()
        d._parse_tokens()
        if device:
            os.environ["FFPIC_VP8_DEVICE"] = "1"
        try:
            d._residuals()
        finally:
            os.environ.pop("FFPIC_VP8_DEVICE", None)
        return d.residual

    np.testing.assert_array_equal(residuals(False), residuals(True))


def test_vp8_device_color_matches_numpy(rng):
    import numpy as np
    from ffpic_tpu.formats.webp import _yuv_to_rgb_libwebp
    from ffpic_tpu.ops.vp8_kernels import vp8_yuv_to_rgba
    H = W = 40
    Y = rng.integers(0, 256, (48, 48)).astype(np.uint8)
    U = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    V = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    r, g, b = _yuv_to_rgb_libwebp(Y, U, V, H, W)
    dev = np.asarray(vp8_yuv_to_rgba(Y, U, V, H, W))
    np.testing.assert_array_equal(dev[..., 0], r)
    np.testing.assert_array_equal(dev[..., 1], g)
    np.testing.assert_array_equal(dev[..., 2], b)


def test_native_pipeline_matches_python(tmp_path):
    """Full decode with native token/recon/filter kernels equals the
    pure-Python path bit-exactly."""
    import os
    import ffpic_tpu
    path = os.path.join(REPO, "corpus", "webp_512.webp")
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    native_px = ffpic_tpu.load(path).np_pixels()
    os.environ["FFPIC_NO_NATIVE"] = "1"
    try:
        py_px = ffpic_tpu.load(path).np_pixels()
    finally:
        os.environ.pop("FFPIC_NO_NATIVE", None)
    np.testing.assert_array_equal(native_px, py_px)


def test_vp8l_encoder_roundtrip_vs_both_decoders():
    """VP8L encoder (formats/vp8l_enc): output decodes bit-exactly
    through BOTH our VP8L decoder and libwebp (PIL).  The reference
    has no WebP encoder and stubs even VP8L decode."""
    import io
    from PIL import Image
    import ffpic_tpu
    from ffpic_tpu.formats.vp8l_enc import encode_webp_lossless

    rng = np.random.default_rng(3)
    g = np.clip(np.add.outer(np.arange(60), np.arange(90)) % 256
                + rng.integers(-9, 9, (60, 90)), 0, 255) \
        .astype(np.uint8)
    cases = [
        np.stack([g, np.roll(g, 5, 0), np.roll(g, 2, 1),
                  np.full_like(g, 255)], -1),
        np.dstack([np.stack([g] * 3, -1),
                   (g // 2 + 100).astype(np.uint8)]),   # real alpha
        np.full((33, 47, 4), 77, np.uint8),             # flat
        rng.integers(0, 256, (64, 64, 4), dtype=np.uint8),  # noise
    ]
    for arr in cases:
        data = encode_webp_lossless(arr)
        ours = ffpic_tpu.load(data).np_pixels()
        np.testing.assert_array_equal(ours, arr)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        np.testing.assert_array_equal(pil, arr)


def test_webp_encode_via_registry():
    import io
    from PIL import Image
    import ffpic_tpu
    from ffpic_tpu.formats import registry

    rng = np.random.default_rng(4)
    arr = np.kron(rng.integers(0, 256, (8, 8, 4)),
                  np.ones((4, 4, 1))).astype(np.uint8)
    arr[..., 3] = 255
    pic = ffpic_tpu.load(registry.encode(
        ffpic_tpu.load(_encode_png(arr)), "WEBP"))
    np.testing.assert_array_equal(pic.np_pixels(), arr)


def _encode_png(arr):
    import io
    from PIL import Image
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "PNG")
    return b.getvalue()


# ---------------------------------------------------------------------------
# Animated WebP (ANIM/ANMF) — beyond the reference (webp.c: none)
# ---------------------------------------------------------------------------

def _pil_anim_frames(data):
    """Oracle: libwebp's WebPAnimDecoder via PIL — full RGBA canvases."""
    import io
    from PIL import Image
    im = Image.open(io.BytesIO(data))
    out = []
    for i in range(im.n_frames):
        im.seek(i)
        out.append(np.array(im.convert("RGBA")))
    return out


def test_webp_animation_lossless_pil_oracle():
    import io
    from PIL import Image
    import ffpic_tpu

    rng = np.random.default_rng(11)
    base = np.kron(rng.integers(0, 256, (16, 16, 4)),
                   np.ones((4, 4, 1))).astype(np.uint8)
    frames = []
    for i in range(4):
        f = np.roll(base, i * 8, axis=1).copy()
        f[:16, :16, :3] = i * 60
        f[..., 3] = np.where(f[..., 3] > 128, 255, f[..., 3])
        frames.append(Image.fromarray(f))
    b = io.BytesIO()
    frames[0].save(b, "WEBP", save_all=True, append_images=frames[1:],
                   duration=[40, 50, 60, 70], loop=2, lossless=True,
                   exact=True)
    data = b.getvalue()

    want = _pil_anim_frames(data)
    pic = ffpic_tpu.load(data)
    got = [pic.np_pixels()] + [f.np_pixels() for f in pic.frames]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w, err_msg=f"frame {i}")
    assert pic.delay_ms == 40
    assert pic.meta["loop"] == 2


def test_webp_animation_lossy_pil_oracle():
    import io
    from PIL import Image
    import ffpic_tpu

    rng = np.random.default_rng(12)
    base = np.kron(rng.integers(0, 256, (12, 12, 3)),
                   np.ones((8, 8, 1))).astype(np.uint8)
    frames = [Image.fromarray(np.roll(base, i * 16, axis=0))
              for i in range(3)]
    b = io.BytesIO()
    frames[0].save(b, "WEBP", save_all=True, append_images=frames[1:],
                   duration=100, lossless=False, quality=80)
    data = b.getvalue()

    want = _pil_anim_frames(data)
    pic = ffpic_tpu.load(data)
    got = [pic.np_pixels()] + [f.np_pixels() for f in pic.frames]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w, err_msg=f"frame {i}")


def _anmf(x, y, w, h, dur, flags, payload):
    import struct
    hdr = (x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little") \
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little") \
        + dur.to_bytes(3, "little") + bytes([flags])
    body = hdr + payload
    chunk = b"ANMF" + struct.pack("<I", len(body)) + body
    return chunk + (b"\0" if len(body) & 1 else b"")


def _webp_payload_chunks(img):
    """Encode a PIL image as still WebP and return its payload chunks
    (VP8/VP8L/ALPH) for hand-built ANMF containers."""
    import io
    import struct
    b = io.BytesIO()
    img.save(b, "WEBP", lossless=True, exact=True)
    data = b.getvalue()
    pos, out = 12, b""
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag in (b"VP8 ", b"VP8L", b"ALPH"):
            out += data[pos:pos + 8 + size]
            if size & 1:
                out += b"\0"
        pos += 8 + size + (size & 1)
    return out


def test_webp_animation_offsets_blend_dispose():
    """Hand-built container: sub-canvas frames at offsets, alpha
    blending vs replace, dispose-to-background — vs the libwebp
    demuxer (PIL)."""
    import struct
    from PIL import Image
    import ffpic_tpu

    rng = np.random.default_rng(13)
    cw, ch = 64, 48
    f0 = rng.integers(0, 256, (ch, cw, 4), np.uint8)
    f0[..., 3] = 255
    # frame 1: 32x16 at (16, 8), semi-transparent, BLEND, dispose bg
    f1 = rng.integers(0, 256, (16, 32, 4), np.uint8)
    # frame 2: 24x24 at (0, 24), NO_BLEND (replace incl. alpha)
    f2 = rng.integers(0, 256, (24, 24, 4), np.uint8)

    payload = b""
    payload += _anmf(0, 0, cw, ch, 40, 0,
                     _webp_payload_chunks(Image.fromarray(f0)))
    payload += _anmf(16, 8, 32, 16, 50, 0b01,
                     _webp_payload_chunks(Image.fromarray(f1)))
    payload += _anmf(24, 0, 24, 24, 60, 0b10,
                     _webp_payload_chunks(Image.fromarray(f2)))

    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x12, 0, 0, 0]) \
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    anim = b"ANIM" + struct.pack("<I", 6) + struct.pack("<IH", 0, 0)
    body = b"WEBP" + vp8x + anim + payload
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    want = _pil_anim_frames(data)
    pic = ffpic_tpu.load(data)
    got = [pic.np_pixels()] + [f.np_pixels() for f in pic.frames]
    assert len(got) == 3 == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w, err_msg=f"frame {i}")


def test_webp_animation_blend_torture():
    """16K random (src, dst) alpha pairs through one blended ANMF
    frame — pins the exact libwebp 1.6 blend arithmetic (dst weight
    (da*(256-sa))>>8, truncated 0x1000000/blend_a reciprocal)."""
    import struct
    from PIL import Image
    import ffpic_tpu

    rng = np.random.default_rng(99)
    N = 128
    dst = rng.integers(0, 256, (N, N, 4), np.uint8)
    src = rng.integers(0, 256, (N, N, 4), np.uint8)
    payload = _anmf(0, 0, N, N, 40, 0b10,
                    _webp_payload_chunks(Image.fromarray(dst)))
    payload += _anmf(0, 0, N, N, 40, 0b00,
                     _webp_payload_chunks(Image.fromarray(src)))
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x12, 0, 0, 0]) \
        + (N - 1).to_bytes(3, "little") + (N - 1).to_bytes(3, "little")
    anim = b"ANIM" + struct.pack("<I", 6) + struct.pack("<IH", 0, 0)
    body = b"WEBP" + vp8x + anim + payload
    data = b"RIFF" + struct.pack("<I", len(body)) + body

    want = _pil_anim_frames(data)
    pic = ffpic_tpu.load(data)
    got = [pic.np_pixels()] + [f.np_pixels() for f in pic.frames]
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_vp8l_out_of_range_palette_index():
    """Palette (color-indexing) streams may code indices >= palette
    size; libwebp expands the color map with a ZERO tail
    (vp8l_dec.c ExpandColorMap) — decoders must not clamp.  The
    libwebp anim encoder emits such streams for RGBA content whose
    transparent pixels fall outside the palette."""
    import io
    import struct
    from PIL import Image
    from ffpic_tpu.formats.vp8l import decode_vp8l

    rng = np.random.default_rng(11)
    base = np.kron(rng.integers(0, 256, (16, 16, 4)),
                   np.ones((4, 4, 1))).astype(np.uint8)
    f = base.copy()
    f[:16, :16, :3] = 0
    f[..., 3] = np.where(f[..., 3] > 128, 255, f[..., 3])
    b = io.BytesIO()
    frames = [Image.fromarray(f), Image.fromarray(np.roll(f, 8, axis=1))]
    frames[0].save(b, "WEBP", save_all=True, append_images=frames[1:],
                   duration=40, lossless=True, exact=True)
    data = b.getvalue()
    pos, n = 12, 0
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if tag == b"ANMF":
            pl = data[pos + 8:pos + 8 + size]
            p = 16
            while p + 8 <= len(pl):
                t = pl[p:p + 4]
                s = struct.unpack_from("<I", pl, p + 4)[0]
                if t == b"VP8L":
                    payload = pl[p + 8:p + 8 + s]
                    body = b"WEBP" + b"VP8L" + struct.pack(
                        "<I", len(payload)) + payload \
                        + (b"\0" if len(payload) & 1 else b"")
                    still = b"RIFF" + struct.pack("<I", len(body)) + body
                    want = np.array(Image.open(
                        io.BytesIO(still)).convert("RGBA"))
                    np.testing.assert_array_equal(
                        decode_vp8l(payload), want)
                    n += 1
                p += 8 + s + (s & 1)
        pos += 8 + size + (size & 1)
    assert n == 2


def test_webp_animation_encode_roundtrip():
    """Animated WebP ENCODE (beyond reference: no WebP encoder at
    all in webp.c): multi-frame pic -> VP8X+ANIM+ANMF with lossless
    VP8L frames, verified against libwebp's decoder (PIL) AND our
    own animation decoder, frames exact."""
    import io
    import numpy as np
    from PIL import Image
    import ffpic_tpu
    from ffpic_tpu.formats import registry
    from ffpic_tpu.formats.pic import Pic, PixelFormat

    rng = np.random.default_rng(5)
    frames = []
    for i in range(3):
        f = np.kron(rng.integers(0, 256, (8, 8, 4)),
                    np.ones((8, 8, 1))).astype(np.uint8)
        f[..., 3] = np.where(f[..., 3] > 100, 255, f[..., 3])
        frames.append(f)
    pics = [Pic(pixels=f, width=64, height=64, depth=32, pitch=256,
                format=PixelFormat.RGBA32, codec="X",
                delay_ms=40 + 10 * i)
            for i, f in enumerate(frames)]
    main = pics[0]
    main.frames = pics[1:]
    data = registry.encode(main, "WEBP", loops=3)

    im = Image.open(io.BytesIO(data))
    assert im.n_frames == 3
    for i in range(3):
        im.seek(i)
        np.testing.assert_array_equal(
            np.array(im.convert("RGBA")), frames[i],
            err_msg=f"libwebp frame {i}")

    pic = ffpic_tpu.load(data)
    ours = [pic.np_pixels()] + [f.np_pixels() for f in pic.frames]
    for i, (a, b) in enumerate(zip(ours, frames)):
        np.testing.assert_array_equal(a, b, err_msg=f"self frame {i}")
    assert pic.delay_ms == 40
    assert [f.delay_ms for f in pic.frames] == [50, 60]
    assert pic.meta["loop"] == 3


def test_webp_animation_encode_size_mismatch():
    import numpy as np
    import pytest
    from ffpic_tpu.formats import registry
    from ffpic_tpu.formats.pic import Pic, PixelFormat

    a = np.zeros((32, 32, 4), np.uint8)
    b = np.zeros((16, 16, 4), np.uint8)
    p0 = Pic(pixels=a, width=32, height=32, depth=32, pitch=128,
             format=PixelFormat.RGBA32, codec="X")
    p1 = Pic(pixels=b, width=16, height=16, depth=32, pitch=64,
             format=PixelFormat.RGBA32, codec="X")
    p0.frames = [p1]
    with pytest.raises(ValueError, match="canvas"):
        registry.encode(p0, "WEBP")
