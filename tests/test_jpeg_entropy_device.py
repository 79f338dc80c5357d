"""Device-side JPEG entropy decode (ops/jpeg_entropy_device) vs the
native host decoder: coefficient-exact and pixel-exact over
DRI-segmented baseline streams."""

import io

import numpy as np
import pytest

from PIL import Image


def _jpeg_with_dri(rng, h=96, w=128, quality=85, rows=1):
    arr = np.kron(rng.integers(0, 256, (h // 16, w // 16, 3)),
                  np.ones((16, 16, 1))).astype(np.uint8)
    arr = np.clip(arr.astype(int)
                  + rng.integers(-20, 20, arr.shape), 0, 255) \
        .astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality,
                              subsampling="4:2:0",
                              restart_marker_rows=rows)
    return b.getvalue()


@pytest.mark.parametrize("quality,rows", [(85, 1), (95, 1), (30, 2),
                                          (85, 4)])
def test_device_entropy_coeffs_match_host(rng, quality, rows):
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import (assemble_planes,
                                                   decode_coeffs_device)

    data = _jpeg_with_dri(rng, quality=quality, rows=rows)
    flat, js, consts, steps = decode_coeffs_device([data, data])
    j = js[0]
    planes = assemble_planes(flat, 2, j)

    # host (native) reference decode of the same stream
    jh, _ = jpg.parse_and_decode(data)
    assert jh.coeffs_raster
    for ci, c in enumerate(jh.comps):
        want = jh.coeffs[ci].reshape(c.nby, c.nbx, 8, 8)
        for img in range(2):
            got = np.asarray(planes[ci][img])
            np.testing.assert_array_equal(
                got, want, err_msg=f"comp {ci} img {img}")


def test_device_entropy_end_to_end_pixels(rng):
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import \
        decode_batch_device_entropy

    data = _jpeg_with_dri(rng, h=64, w=96, quality=90)
    out = np.asarray(decode_batch_device_entropy([data] * 3,
                                                 mode="bt601"))
    want = jpg.load(data, mode="bt601")[0].np_pixels()
    assert out.shape == (3, want.shape[0], want.shape[1], 4)
    for i in range(3):
        np.testing.assert_array_equal(out[i], want)


def test_device_entropy_rejects_no_dri(rng):
    from ffpic_tpu.ops.jpeg_entropy_device import decode_coeffs_device
    b = io.BytesIO()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        b, "JPEG", quality=85)
    with pytest.raises(ValueError):
        decode_coeffs_device([b.getvalue()])


def test_device_entropy_mixed_batch(rng):
    """One merged launch across mixed sizes AND mixed Huffman tables
    (optimize=True emits custom DHT): pixel-exact vs the host path
    per image."""
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import (decode_batch_dri_mixed,
                                                   eligible)

    def make(h, w, q, opt):
        arr = np.kron(rng.integers(0, 256, (h // 16, w // 16, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=q,
                                  subsampling="4:2:0",
                                  restart_marker_blocks=4,
                                  optimize=opt)
        return b.getvalue()

    datas = [make(64, 96, 85, False), make(128, 80, 70, True),
             make(96, 96, 92, True), make(48, 48, 80, False)]
    js = [jpg.parse_and_decode(d, skip_decode=True)[0] for d in datas]
    assert all(eligible(j) for j in js)
    assert len({(j.mcus_x, j.mcus_y) for j in js}) >= 3
    out = decode_batch_dri_mixed(datas, js, mode="bt601")
    for i, (d, j) in enumerate(zip(datas, js)):
        want = jpg.load(d, mode="bt601")[0].np_pixels()
        got = np.asarray(out[i])[:j.height, :j.width]
        np.testing.assert_array_equal(got, want, err_msg=f"img {i}")


def test_decode_batch_uses_mixed_device_path(rng, monkeypatch):
    """decode_batch routes mixed-geometry DRI JPEGs through the merged
    device-entropy launch (FFPIC_DEVICE_ENTROPY=1 forces it on CPU)."""
    import ffpic_tpu

    monkeypatch.setenv("FFPIC_DEVICE_ENTROPY", "1")
    datas = []
    for (h, w) in [(64, 96), (128, 80), (64, 96), (48, 48)]:
        arr = np.kron(rng.integers(0, 256, (h // 16, w // 16, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=85,
                                  subsampling="4:2:0",
                                  restart_marker_blocks=4)
        datas.append(b.getvalue())
    batch = np.asarray(ffpic_tpu.decode_batch(datas, size=(64, 64)))
    assert batch.shape == (4, 64, 64, 4)
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.resize import resize_rgba
    import jax.numpy as jnp
    for i, d in enumerate(datas):
        want = np.asarray(resize_rgba(
            jnp.asarray(jpg.load(d, mode="bt601")[0].np_pixels()),
            (64, 64), "bilinear"))
        np.testing.assert_array_equal(batch[i], want, err_msg=f"img {i}")


def _jpeg_plain(rng, h=96, w=128, quality=85, opt=False):
    arr = np.kron(rng.integers(0, 256, (h // 16, w // 16, 3)),
                  np.ones((16, 16, 1))).astype(np.uint8)
    arr = np.clip(arr.astype(int)
                  + rng.integers(-20, 20, arr.shape), 0, 255) \
        .astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality,
                              subsampling="4:2:0", optimize=opt)
    return b.getvalue()


@pytest.mark.parametrize("quality,chunk", [(85, 512), (95, 512),
                                           (30, 1024), (85, 4096)])
def test_spec_entropy_coeffs_match_host(quality, chunk):
    """Self-sync speculative decode of DRI-less streams: coefficient-
    exact vs the native host decoder across chunk sizes (including a
    chunk larger than the stream = single serial lane).

    Local rng: the session-scoped fixture's stream depends on which
    tests ran before (subset selection changed the data and tripped
    legitimate tiny-chunk sync fallbacks)."""
    rng = np.random.default_rng(77)
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import (
        assemble_planes, decode_coeffs_device_spec)

    data = _jpeg_plain(rng, quality=quality)
    flat, js, consts, lanes = decode_coeffs_device_spec(
        [data, data], chunk_bytes=chunk, unroll=2)
    j = js[0]
    planes = assemble_planes(flat, 2, j)

    jh, _ = jpg.parse_and_decode(data)
    assert jh.coeffs_raster
    for ci, c in enumerate(jh.comps):
        want = jh.coeffs[ci].reshape(c.nby, c.nbx, 8, 8)
        for img in range(2):
            got = np.asarray(planes[ci][img])
            np.testing.assert_array_equal(
                got, want, err_msg=f"comp {ci} img {img}")


def test_spec_entropy_end_to_end_pixels():
    rng = np.random.default_rng(78)
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import \
        decode_batch_device_entropy_spec

    data = _jpeg_plain(rng, h=64, w=96, quality=90)
    out = np.asarray(decode_batch_device_entropy_spec(
        [data] * 2, mode="bt601", chunk_bytes=384))
    want = jpg.load(data, mode="bt601")[0].np_pixels()
    assert out.shape == (2, want.shape[0], want.shape[1], 4)
    for i in range(2):
        np.testing.assert_array_equal(out[i], want)


def test_spec_entropy_custom_tables():
    """optimize=True emits image-specific Huffman tables; the sync
    property must hold for them too."""
    rng = np.random.default_rng(79)
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import (
        assemble_planes, decode_coeffs_device_spec)

    data = _jpeg_plain(rng, h=128, w=160, quality=75, opt=True)
    flat, js, consts, _ = decode_coeffs_device_spec(
        [data], chunk_bytes=512, unroll=2)
    j = js[0]
    planes = assemble_planes(flat, 1, j)
    jh, _ = jpg.parse_and_decode(data)
    for ci, c in enumerate(jh.comps):
        want = jh.coeffs[ci].reshape(c.nby, c.nbx, 8, 8)
        np.testing.assert_array_equal(np.asarray(planes[ci][0]), want,
                                      err_msg=f"comp {ci}")


def test_spec_entropy_tiny_chunks_fallback_contract():
    rng = np.random.default_rng(80)
    """Chunks too small for the joint (bit, k, sub) state to
    self-synchronize must either still decode exactly or raise the
    documented ValueError (host-path fallback) — never return wrong
    coefficients."""
    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_entropy_device import (
        assemble_planes, decode_coeffs_device_spec)

    data = _jpeg_plain(rng, quality=95)
    try:
        flat, js, consts, _ = decode_coeffs_device_spec(
            [data], chunk_bytes=256, unroll=2)
    except ValueError:
        return                          # clean fallback: contract held
    j = js[0]
    planes = assemble_planes(flat, 1, j)
    jh, _ = jpg.parse_and_decode(data)
    for ci, c in enumerate(jh.comps):
        want = jh.coeffs[ci].reshape(c.nby, c.nbx, 8, 8)
        np.testing.assert_array_equal(np.asarray(planes[ci][0]), want)
