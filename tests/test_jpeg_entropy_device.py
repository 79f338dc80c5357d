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
