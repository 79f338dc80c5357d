"""Device HEVC residual kernels (ops/hevc_kernels) vs the golden
numpy pass (coding/hevc_consts), which is itself dual-oracle validated
(encoder roundtrip + byte-exact vs the compiled C reference)."""

import os

import numpy as np
import pytest

from ffpic_tpu.coding import hevc_consts as hc
from ffpic_tpu.ops import hevc_kernels as hk


@pytest.mark.parametrize("n,dst", [(4, False), (4, True), (8, False),
                                   (16, False), (32, False)])
@pytest.mark.parametrize("bd", [8, 10])
def test_dequant_itransform_batch_bit_exact(n, dst, bd, rng):
    B = 24
    # mix of sparse (realistic) and dense/extreme levels
    lv = rng.integers(-40, 41, (B, n, n)).astype(np.int32)
    lv[: B // 3] *= rng.integers(0, 2, (B // 3, n, n)).astype(np.int32)
    lv[-2] = 32767
    lv[-1] = -32768
    qps = rng.integers(0, 52, (B,)).astype(np.int32)
    got = np.asarray(hk.dequant_itransform_batch(
        lv, qps, n, bit_depth=bd, dst=dst))
    for i in range(B):
        d = hc.dequant(lv[i], int(qps[i]), bd)
        want = hc.inverse_transform(d, dst=dst, bit_depth=bd)
        np.testing.assert_array_equal(got[i], want,
                                      err_msg=f"TU {i} qp={qps[i]}")


@pytest.mark.parametrize("bd", [8, 10])
def test_dequant_skip_batch_bit_exact(bd, rng):
    B, n = 16, 4
    lv = rng.integers(-3000, 3000, (B, n, n)).astype(np.int32)
    qps = rng.integers(0, 52, (B,)).astype(np.int32)
    got = np.asarray(hk.dequant_skip_batch(lv, qps, n, bit_depth=bd))
    shift2 = 20 - bd
    for i in range(B):
        d = hc.dequant(lv[i], int(qps[i]), bd).astype(np.int64)
        want = np.clip(((d << 7) + (1 << (shift2 - 1))) >> shift2,
                       -32768, 32767)
        np.testing.assert_array_equal(got[i], want)


def test_execute_ops_device_path_matches_host(rng):
    """Full decode with FFPIC_HEVC_DEVICE=1 (batched device residuals
    + host wavefront prediction) must be sample-exact vs the default
    host path."""
    import ffpic_tpu
    from ffpic_tpu.formats.heif_enc import encode_heif
    from ffpic_tpu.formats.pic import Pic

    arr = np.kron(rng.integers(0, 256, (16, 16, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    arr = np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
    p = Pic(pixels=arr, width=128, height=128)
    blob = encode_heif(p, quality=55)

    host = ffpic_tpu.load(blob).np_pixels()
    os.environ["FFPIC_HEVC_DEVICE"] = "1"
    os.environ["FFPIC_NO_NATIVE_RECON"] = "1"
    try:
        dev = ffpic_tpu.load(blob).np_pixels()
    finally:
        del os.environ["FFPIC_HEVC_DEVICE"]
        del os.environ["FFPIC_NO_NATIVE_RECON"]
    np.testing.assert_array_equal(host, dev)


def test_native_recon_with_device_residuals(rng):
    """FFPIC_HEVC_DEVICE on the NATIVE path: residuals_packed computes
    every TU on device (bucketed launches) and ffpic_hevc_recon2 adds
    them — must equal the all-host decode exactly."""
    import ffpic_tpu
    from ffpic_tpu.formats.heif_enc import encode_heif
    from ffpic_tpu.formats.pic import Pic

    arr = np.kron(rng.integers(0, 256, (8, 8, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    arr = np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
    blob = encode_heif(Pic(pixels=arr, width=64, height=64),
                       quality=60)
    host = ffpic_tpu.load(blob).np_pixels()
    os.environ["FFPIC_HEVC_DEVICE"] = "1"
    try:
        dev = ffpic_tpu.load(blob).np_pixels()
    finally:
        del os.environ["FFPIC_HEVC_DEVICE"]
    np.testing.assert_array_equal(host, dev)
