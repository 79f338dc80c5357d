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
