"""HEIF/HEIC end-to-end: encode -> container parse -> full pixel
decode (single item, grid, alpha aux), plus structural metadata."""

import numpy as np
import pytest

import ffpic_tpu
from ffpic_tpu.formats.pic import Pic


def _pic(W, H, seed=1, alpha=False):
    rng = np.random.default_rng(seed)
    base = np.kron(rng.integers(0, 256,
                                (-(-H // 16), -(-W // 16), 3)),
                   np.ones((16, 16, 1)))[:H, :W]
    if alpha:
        a = np.kron(rng.integers(0, 256, (-(-H // 32), -(-W // 32))),
                    np.ones((32, 32)))[:H, :W]
    else:
        a = np.full((H, W), 255)
    rgba = np.concatenate([base, a[:, :, None]], axis=-1).astype(np.uint8)
    return Pic(width=W, height=H, depth=32, pitch=W * 4, codec="raw",
               pixels=rgba), rgba


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = (err ** 2).mean()
    return 99.0 if mse < 1e-9 else 10 * np.log10(255 ** 2 / mse)


def test_heif_single_item_roundtrip():
    pic, rgba = _pic(96, 80)
    heic = ffpic_tpu.encode(pic, "heif", qp=22)
    out = ffpic_tpu.load(heic)
    assert out.codec == "HEIF"
    dec = np.asarray(out.pixels)
    assert dec.shape == (80, 96, 4)
    assert _psnr(dec[:, :, :3], rgba[:, :, :3]) > 35


def test_heif_grid_and_alpha_roundtrip():
    pic, rgba = _pic(150, 120, seed=2, alpha=True)
    heic = ffpic_tpu.encode(pic, "heif", qp=20, tile=64)
    out = ffpic_tpu.load(heic)
    dec = np.asarray(out.pixels)
    assert dec.shape == (120, 150, 4)
    assert out.meta["grid"] == dict(rows=2, cols=3, width=150,
                                    height=120)
    assert out.meta.get("alpha") is True
    assert _psnr(dec[:, :, :3], rgba[:, :, :3]) > 35
    assert _psnr(dec[:, :, 3], rgba[:, :, 3]) > 40


def test_heif_skip_decode_metadata():
    pic, _ = _pic(64, 64)
    heic = ffpic_tpu.encode(pic, "heif", qp=30)
    out = ffpic_tpu.load(heic, skip_decode=True)
    assert out.pixels is None
    assert out.width == 64 and out.height == 64
    assert out.meta["hevc"]["bit_depth"] == 8
    info = ffpic_tpu.info(out)
    assert "HEIF" in info and "HEVC" in info


def test_heif_quality_ladder():
    pic, rgba = _pic(64, 64, seed=3)
    sizes, psnrs = [], []
    for qp in (12, 30, 45):
        heic = ffpic_tpu.encode(pic, "heif", qp=qp)
        dec = np.asarray(ffpic_tpu.load(heic).pixels)
        sizes.append(len(heic))
        psnrs.append(_psnr(dec[:, :, :3], rgba[:, :, :3]))
    assert sizes[0] > sizes[1] > sizes[2]
    assert psnrs[0] > psnrs[1] > psnrs[2]
    assert psnrs[0] > 44


def test_heif_odd_dimensions():
    # non-multiple-of-8 dims exercise SPS conformance padding
    pic, rgba = _pic(50, 34, seed=4)
    heic = ffpic_tpu.encode(pic, "heif", qp=20)
    dec = np.asarray(ffpic_tpu.load(heic).pixels)
    assert dec.shape == (34, 50, 4)
    assert _psnr(dec[:, :, :3], rgba[:, :, :3]) > 34


def test_heif_truncated_raises():
    pic, _ = _pic(64, 64)
    heic = ffpic_tpu.encode(pic, "heif", qp=30)
    with pytest.raises((ValueError, NotImplementedError)):
        ffpic_tpu.load(heic[:len(heic) // 2])
