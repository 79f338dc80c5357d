"""JPEG feature coverage: restart intervals, progressive, encoder
roundtrips, native-vs-oracle differentials."""

import io
import os

import numpy as np
import pytest
from PIL import Image


def _decode_rgb(data, **kw):
    from ffpic_tpu.formats import jpg
    return jpg.load(data, **kw)[0].to_rgba32()[..., :3]


def test_restart_intervals_match_libjpeg():
    cv2 = pytest.importorskip("cv2")
    arr = np.random.default_rng(3).integers(0, 256, (96, 112, 3),
                                            dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", arr[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 80,
                            cv2.IMWRITE_JPEG_RST_INTERVAL, 4])
    assert ok
    data = buf.tobytes()
    assert b"\xff\xdd" in data          # DRI marker present
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGB")).astype(float)
    from ffpic_tpu.formats import jpg
    pic = jpg.load(data, mode="bt601", upsample="fancy")[0]
    ours = pic.to_rgba32()[..., :3].astype(float)
    mse = ((ours - pil) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert psnr > 55, f"restart-interval decode diverges: {psnr:.1f} dB"


def test_restart_decode_identical_to_unrestarted():
    """Restart handling must not change pixels at all vs the same
    content encoded without restarts."""
    cv2 = pytest.importorskip("cv2")
    arr = np.random.default_rng(3).integers(0, 256, (96, 112, 3),
                                            dtype=np.uint8)
    _, b1 = cv2.imencode(".jpg", arr, [cv2.IMWRITE_JPEG_QUALITY, 80,
                                       cv2.IMWRITE_JPEG_RST_INTERVAL, 4])
    _, b0 = cv2.imencode(".jpg", arr, [cv2.IMWRITE_JPEG_QUALITY, 80])
    from ffpic_tpu.formats import jpg
    p1 = jpg.load(b1.tobytes())[0].to_rgba32()
    p0 = jpg.load(b0.tobytes())[0].to_rgba32()
    np.testing.assert_array_equal(p1, p0)


def test_fancy_upsample_tracks_libjpeg(rng):
    """The h2v2 fancy upsampler must track libjpeg closely even on
    noise chroma (nearest-neighbor gives only ~23 dB here)."""
    arr = rng.integers(0, 256, (96, 112, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=80, subsampling="4:2:0")
    data = b.getvalue()
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGB")).astype(float)
    from ffpic_tpu.formats import jpg
    ours = jpg.load(data, mode="bt601", upsample="fancy")[0] \
        .to_rgba32()[..., :3].astype(float)
    psnr = 10 * np.log10(255 ** 2 / max(((ours - pil) ** 2).mean(), 1e-9))
    assert psnr > 55, f"fancy upsample diverges: {psnr:.1f} dB"


def test_restart_native_vs_oracle():
    cv2 = pytest.importorskip("cv2")
    arr = np.random.default_rng(4).integers(0, 256, (64, 80, 3),
                                            dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", arr,
                           [cv2.IMWRITE_JPEG_RST_INTERVAL, 2])
    data = buf.tobytes()
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.formats.jpg_host import dezigzag_planes
    jn, _ = jpg.parse_and_decode(data)
    os.environ["FFPIC_NO_NATIVE"] = "1"
    try:
        jp, _ = jpg.parse_and_decode(data)
    finally:
        del os.environ["FFPIC_NO_NATIVE"]
    for cn, cp in zip(jn.coeffs, jp.coeffs):
        np.testing.assert_array_equal(
            cn.reshape(cn.shape[0], cn.shape[1], 8, 8),
            dezigzag_planes(cp))


def test_progressive_native_vs_oracle_420(rng):
    arr = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=85, progressive=True,
                              subsampling="4:2:0")
    data = b.getvalue()
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.formats.jpg_host import dezigzag_planes
    jn, _ = jpg.parse_and_decode(data)
    os.environ["FFPIC_NO_NATIVE"] = "1"
    try:
        jp, _ = jpg.parse_and_decode(data)
    finally:
        del os.environ["FFPIC_NO_NATIVE"]
    for cn, cp in zip(jn.coeffs, jp.coeffs):
        np.testing.assert_array_equal(
            cn.reshape(cn.shape[0], cn.shape[1], 8, 8),
            dezigzag_planes(cp))


def test_progressive_vs_pil(rng):
    arr = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=85, progressive=True,
                              subsampling="4:4:4")
    data = b.getvalue()
    pil = np.array(Image.open(io.BytesIO(data)).convert("RGB")).astype(float)
    ours = _decode_rgb(data, mode="bt601").astype(float)
    psnr = 10 * np.log10(255 ** 2 / max(((ours - pil) ** 2).mean(), 1e-9))
    assert psnr > 45, f"progressive decode diverges: {psnr:.1f} dB"


def test_encoder_decodes_everywhere(rng):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    arr = rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)
    arr[..., 3] = 255
    pic = Pic(pixels=arr, width=64, height=48, format="RGBA32")
    data = ffpic_tpu.encode(pic, "JPG", quality=90)
    # PIL agrees it is a valid JPEG of the right size
    im = Image.open(io.BytesIO(data))
    assert im.size == (64, 48)
    # we decode our own stream
    rt = ffpic_tpu.load(data)
    assert rt.width == 64 and rt.height == 48
