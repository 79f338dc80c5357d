"""Corrupt-input robustness: random byte mutations must yield clean
errors or decodes, never crashes/memory corruption.  A fast regression
subset of the ASAN fuzz campaign (the native decoders are bounds-
hardened: htable canonical-space check, DHT-slot validation, HEVC
SPS/PPS range validation + map clamps)."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "corpus")


@pytest.mark.parametrize("name", ["jpeg_512_420.jpg",
                                  "jpeg_prog_512_420.jpg",
                                  "gif_512.gif", "webp_512.webp",
                                  "png_512_rgba.png", "bmp_512.bmp",
                                  "ppm_512.ppm", "tga_512.tga"])
def test_byte_corruption_never_crashes(name):
    import ffpic_tpu
    path = os.path.join(CORPUS, name)
    if not os.path.exists(path):
        pytest.skip("corpus missing")
    data = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    for trial in range(12):
        d = bytearray(data)
        for _ in range(rng.integers(1, 40)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass


def test_heic_corruption_never_crashes(tmp_path):
    import ffpic_tpu
    from ffpic_tpu.formats.pic import Pic
    rng = np.random.default_rng(5)
    rgba = np.kron(rng.integers(0, 256, (4, 5, 3)),
                   np.ones((16, 16, 1)))
    rgba = np.concatenate([rgba, np.full((64, 80, 1), 255)],
                          axis=-1).astype(np.uint8)
    pic = Pic(width=80, height=64, depth=32, pitch=320, codec="raw",
              pixels=rgba)
    data = bytearray(ffpic_tpu.encode(pic, "heif", qp=28))
    for trial in range(20):
        d = bytearray(data)
        for _ in range(rng.integers(1, 30)):
            d[rng.integers(0, len(d))] = rng.integers(0, 256)
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError):
            pass
