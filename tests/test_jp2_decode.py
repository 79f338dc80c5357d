"""JPEG 2000 pixel decode (coding/jpeg2000 + formats/jp2) vs openjpeg
(via PIL): the reference produces no JP2 pixels at all (jp2.c stops at
packet headers), so this is beat-the-reference coverage.  Reversible
(5/3 + RCT) must be bit-exact; irreversible (9/7 + ICT) within +-1 of
openjpeg's float pipeline."""

import io

import numpy as np
import pytest

from PIL import Image


def _content(h, w, seed=2):
    rng = np.random.default_rng(seed)
    g = np.clip(np.add.outer(np.arange(h), np.arange(w)) % 256
                + rng.integers(-9, 9, (h, w)), 0, 255).astype(np.uint8)
    return g


def _roundtrip(arr, mode, tol, **kw):
    b = io.BytesIO()
    Image.fromarray(arr, mode).save(b, "JPEG2000", **kw)
    data = b.getvalue()
    import ffpic_tpu
    pic = ffpic_tpu.load(data)
    got = pic.np_pixels()
    ref = np.asarray(Image.open(io.BytesIO(data)))
    if ref.ndim == 2:
        ref = np.dstack([ref] * 3)
    d = np.abs(got[..., :3].astype(int) - ref[..., :3].astype(int))
    assert d.max() <= tol, f"maxdiff {d.max()} > {tol}"
    return pic


@pytest.mark.parametrize("shape", [(75, 93), (256, 256), (33, 128)])
def test_jp2_reversible_gray_exact(shape):
    _roundtrip(_content(*shape), "L", tol=0, irreversible=False)


def test_jp2_reversible_rgb_exact():
    g = _content(120, 90)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    pic = _roundtrip(rgb, "RGB", tol=0, irreversible=False)
    assert pic.meta["decomposition_levels"] >= 1


def test_jp2_irreversible_97():
    g = _content(96, 144)
    rgb = np.stack([g, np.roll(g, 5, 0), np.roll(g, 2, 1)], -1)
    _roundtrip(g, "L", tol=1, irreversible=True)
    _roundtrip(rgb, "RGB", tol=1, irreversible=True)


def test_jp2_rct_exact():
    # mct=1 + 5/3: the reversible colour transform (G-6) must invert
    # bit-exact (PIL defaults to mct=0, so this needs the explicit flag)
    g = _content(88, 104)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=0, irreversible=False, mct=1)


def test_jp2_ict_97():
    # mct=1 + 9/7: irreversible colour transform (G-2)
    g = _content(96, 80)
    rgb = np.stack([g, np.roll(g, 5, 0), np.roll(g, 2, 1)], -1)
    _roundtrip(rgb, "RGB", tol=1, irreversible=True, mct=1)


@pytest.mark.parametrize("kw", [
    dict(precinct_size=(64, 64)),
    dict(precinct_size=(32, 64), progression="RPCL",
         quality_layers=[50, 20, 0]),
    dict(precinct_size=(64, 64), progression="PCRL"),
    dict(precinct_size=(64, 64), progression="CPRL", mct=1),
])
def test_jp2_explicit_precincts(kw):
    # scod&1 precinct grids: per-precinct tag trees + packet-position
    # iteration (B.12); reversible must stay bit-exact
    g = _content(150, 170)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=0, irreversible=False, **kw)


@pytest.mark.parametrize("kw", [
    dict(tile_size=(64, 64), precinct_size=(32, 32)),
    dict(tile_size=(128, 128), precinct_size=(64, 64),
         progression="RPCL"),
    dict(tile_size=(64, 64), precinct_size=(32, 64),
         quality_layers=[50, 0]),
    dict(tile_size=(64, 64), precinct_size=(32, 32),
         progression="PCRL", mct=1),
    dict(tile_size=(64, 64), precinct_size=(32, 32),
         progression="CPRL"),
])
def test_jp2_multitile_precincts(kw):
    # precinct + code-block grids anchor at 0 on the reference grid,
    # so tiles past the origin start mid-precinct (B-16 absolute
    # anchoring) — bit-exact vs openjpeg across progressions
    g = _content(150, 140)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=0, irreversible=False, **kw)


def test_jp2_multitile_precincts_97():
    g = _content(150, 140)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=1, irreversible=True,
               tile_size=(64, 64), precinct_size=(32, 32))


def test_jp2_explicit_precincts_97():
    g = _content(150, 170)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=1, irreversible=True,
               precinct_size=(128, 128))


@pytest.mark.parametrize("prog", ["PCRL", "CPRL"])
def test_jp2_position_progressions(prog):
    # position-first orders collapse to C->R->L with one precinct
    g = _content(90, 110)
    rgb = np.stack([g, np.roll(g, 7, 0), np.roll(g, 3, 1)], -1)
    _roundtrip(rgb, "RGB", tol=0, irreversible=False,
               progression=prog, quality_layers=[60, 30, 0])


def test_jp2_corrupt_siz_bounded():
    # fuzzed SIZ dims must raise, not allocate terabytes (ASAN find)
    import ffpic_tpu
    b = io.BytesIO()
    Image.fromarray(_content(64, 64), "L").save(b, "JPEG2000",
                                                irreversible=False)
    data = bytearray(b.getvalue())
    i = data.find(b"\xff\x51")
    data[i + 6:i + 10] = (3_000_000_000).to_bytes(4, "big")  # Xsiz
    with pytest.raises(ValueError):
        ffpic_tpu.load(bytes(data))


def test_jp2_multi_layer():
    _roundtrip(_content(80, 80), "L", tol=0, irreversible=False,
               quality_layers=[40, 0])


def test_jp2_noise_reversible_exact():
    rng = np.random.default_rng(5)
    _roundtrip(rng.integers(0, 256, (100, 67), dtype=np.uint8), "L",
               tol=0, irreversible=False)


def test_jp2_raw_codestream():
    """Raw .j2k codestream (no JP2 box wrapper)."""
    b = io.BytesIO()
    Image.fromarray(_content(64, 64), "L").save(b, "JPEG2000",
                                                irreversible=False)
    data = b.getvalue()
    pos = data.find(b"\xff\x4f\xff\x51")
    raw = data[pos:]
    import ffpic_tpu
    got = ffpic_tpu.load(raw).np_pixels()
    ref = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(got[..., 0], ref)


@pytest.mark.parametrize("shape,ts,irr", [
    ((100, 120), (64, 64), False),
    ((200, 130), (64, 64), True),
    ((300, 257), (128, 128), False),
])
def test_jp2_multi_tile(shape, ts, irr):
    """Tiled codestreams: per-tile packet sequences, band geometry and
    synthesis, pasted into the canvas."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(a).save(b, "JPEG2000", irreversible=irr,
                            tile_size=ts)
    data = b.getvalue()
    import ffpic_tpu
    got = ffpic_tpu.load(data).np_pixels()[..., :3].astype(int)
    ref = np.asarray(Image.open(io.BytesIO(data))).astype(int)
    assert np.abs(got - ref).max() <= (1 if irr else 0)


@pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL"])
def test_jp2_progression_orders(prog):
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (80, 96), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(a, "L").save(b, "JPEG2000", irreversible=False,
                                 progression=prog)
    import ffpic_tpu
    got = ffpic_tpu.load(b.getvalue()).np_pixels()[..., 0]
    ref = np.asarray(Image.open(io.BytesIO(b.getvalue())))
    np.testing.assert_array_equal(got, ref)


def test_jp2_16bit_plane_exact():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 65536, (40, 50)).astype(np.uint16)
    b = io.BytesIO()
    Image.fromarray(a).save(b, "JPEG2000", irreversible=False)
    from ffpic_tpu.coding.jpeg2000 import decode_to_planes
    data = b.getvalue()
    pos = data.find(b"\xff\x4f\xff\x51")
    planes, meta = decode_to_planes(data, pos)
    assert meta["depths"] == [16]
    ref = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(planes[0], ref.astype(np.int64))
