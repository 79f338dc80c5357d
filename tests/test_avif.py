"""AVIF end-to-end pixel decode tests (container -> RGBA).

The C reference decodes no AVIF pixels (format/avif.c:382-405 stub);
every test here is beyond-reference coverage.  The AV1 YUV planes are
covered bit-exactly vs dav1d in test_av1.py; here the full
container->RGBA path (nclx color, chroma upsampling, alpha item,
transforms) is compared against PIL (libavif+libyuv), whose
fixed-point color math differs from our float round-half-up by a few
LSB — tolerance 3 with a tight mean bound.
"""

import numpy as np
import pytest

import ffpic_tpu
from ffpic_tpu.formats import avif as avif_mod


def _test_img(w=300, h=200, seed=1):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    g = (x[None, :] + y[:, None]) / 2
    img = np.stack([g, g[::-1], np.abs(g - 128) * 2], -1)
    img = img.astype(np.uint8)
    img += rng.integers(0, 20, img.shape, dtype=np.uint8)
    return img


def _save(img, tmp_path, name, mode=None, **kw):
    from PIL import Image
    fn = tmp_path / name
    im = Image.fromarray(img, mode) if mode else Image.fromarray(img)
    im.save(fn, **kw)
    return fn


def _cmp_pil(fn, tol=3, mean_tol=0.5):
    from PIL import Image
    pic = ffpic_tpu.load(str(fn))
    ours = pic.pixels[:, :, :3].astype(int)
    pil = np.asarray(Image.open(fn).convert("RGB")).astype(int)
    assert ours.shape == pil.shape
    d = np.abs(ours - pil)
    assert d.max() <= tol, f"maxdiff {d.max()}"
    assert d.mean() <= mean_tol, f"meandiff {d.mean()}"
    return pic


@pytest.mark.parametrize("sub,q", [("4:2:0", 60), ("4:4:4", 85),
                                   ("4:2:2", 70), ("4:0:0", 70)])
def test_avif_decode_subsampling(tmp_path, sub, q):
    img = _test_img()
    fn = _save(img, tmp_path, "t.avif", quality=q, subsampling=sub)
    _cmp_pil(fn)


def test_avif_alpha(tmp_path):
    """Auxiliary alpha av01 item fills the real alpha channel
    (byte-exact: alpha is coded lossily but both decoders see the
    same luma plane)."""
    from PIL import Image
    img = _test_img()
    a = np.clip(np.linspace(0, 255, img.shape[0]), 0,
                255).astype(np.uint8)
    rgba = np.dstack([img, np.broadcast_to(a[:, None],
                                           img.shape[:2]).copy()])
    fn = _save(rgba, tmp_path, "a.avif", mode="RGBA", quality=80)
    pic = ffpic_tpu.load(str(fn))
    assert pic.meta.get("alpha")
    pil = np.asarray(Image.open(fn).convert("RGBA")).astype(int)
    d = np.abs(pic.pixels.astype(int) - pil)
    assert d[:, :, 3].max() == 0
    assert d.max() <= 3


def test_avif_sb128_e2e(tmp_path):
    """speed-0 (128x128 superblock) stream through the container
    path."""
    img = _test_img(256, 256)
    fn = _save(img, tmp_path, "s0.avif", quality=60, speed=0)
    _cmp_pil(fn)


def test_avif_picinfo_meta(tmp_path):
    img = _test_img(96, 64)
    fn = _save(img, tmp_path, "m.avif", quality=60)
    pic = ffpic_tpu.load(str(fn), skip_decode=True)
    assert pic.meta["width"] == 96 and pic.meta["height"] == 64
    sh = pic.meta["sequence_header"]
    assert sh["width"] == 96 and sh["bit_depth"] == 8
    assert "AVIF" in avif_mod.info(pic)


def test_avif_garbage():
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        avif_mod.load(b"\x00" * 11 + b"ftypavif" + b"\x00" * 64)


def test_avif_truncated(tmp_path):
    img = _test_img(96, 64)
    fn = _save(img, tmp_path, "tr.avif", quality=60)
    data = fn.read_bytes()[: len(fn.read_bytes()) // 2]
    with pytest.raises(Exception):
        from ffpic_tpu.formats import registry
        registry.load(data)


def _av01_tile(img, q=70):
    """Encode one tile with Pillow/libaom and extract the av01 OBU
    payload + av1C config from the container."""
    import io
    import struct
    from PIL import Image
    from ffpic_tpu.formats import heif as heif_mod
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "AVIF", quality=q)
    data = buf.getvalue()
    s = heif_mod.parse_structure(data)
    pid = s["primary"]
    return (heif_mod.read_item(data, s, pid),
            s["items"][pid]["properties"]["av1C"])


def _make_avif_grid(tiles, rows, cols, W, H, q=70):
    """Assemble an AVIF grid container (grid item + av01 dimg tiles)
    with the in-repo ISOBMFF assembler — exercises the grid decode
    path the same way non-Pillow encoders (avifenc --grid) produce."""
    import struct
    from ffpic_tpu.formats import heif_enc as he
    th, tw = tiles[0].shape[:2]
    grid_payload = bytes((0, 1, rows - 1, cols - 1)) + \
        struct.pack(">II", W, H)
    colr = he._box("colr", b"nclx"
                   + struct.pack(">HHHB", 1, 13, 6, 0x80))
    items = [(1, b"grid", grid_payload, [(he._ispe(W, H), False)])]
    refs = [("dimg", 1, list(range(2, 2 + rows * cols)))]
    next_id = 2
    for t in tiles:
        payload, av1c = _av01_tile(t, q)
        items.append((next_id, b"av01", payload, [
            (he._box("av1C", av1c), True),
            (he._ispe(tw, th), False), (colr, False)]))
        next_id += 1
    return he._assemble(items, refs, 1, brand=b"avif",
                        compat=b"avifmif1miaf")


def test_avif_grid(tmp_path):
    """Grid-of-tiles AVIF: our paste vs PIL's (libavif grid
    reassembly)."""
    from PIL import Image
    img = _test_img(256, 192, seed=5)
    rows, cols, th, tw = 2, 2, 96, 128
    tiles = [img[r * th:(r + 1) * th, c * tw:(c + 1) * tw]
             for r in range(rows) for c in range(cols)]
    data = _make_avif_grid(tiles, rows, cols, 256, 192)
    fn = tmp_path / "g.avif"
    fn.write_bytes(data)
    pic = ffpic_tpu.load(str(fn))
    assert pic.meta["grid"]["rows"] == 2
    assert pic.pixels.shape == (192, 256, 4)
    import numpy as np
    pil = np.asarray(Image.open(fn).convert("RGB")).astype(int)
    d = np.abs(pic.pixels[:, :, :3].astype(int) - pil)
    assert d.max() <= 3 and d.mean() <= 0.6, (d.max(), d.mean())


def test_avif_animation_cover(tmp_path):
    """Animated AVIF (avis): the av01 track decodes through the
    stateful inter decoder and every frame appears exactly once
    (the duplicate still cover is replaced by the track frames)."""
    from PIL import Image
    import numpy as np
    frames = [Image.fromarray(np.full((48, 64, 3), i * 50, np.uint8))
              for i in range(4)]
    fn = tmp_path / "anim.avif"
    frames[0].save(fn, save_all=True, append_images=frames[1:],
                   duration=100)
    pics = ffpic_tpu.load_all(str(fn))
    assert len(pics) == 4
    for i, p in enumerate(pics):
        assert p.pixels.shape == (48, 64, 4)
        got = int(np.median(p.pixels[:, :, 0].astype(int)))
        assert abs(got - i * 50) <= 4, (i, got)
        assert p.delay_ms == 100


def test_avif_10bit_color_path():
    """10-bit YUV -> RGBA conversion path (no 10-bit encoder exists in
    this image, so the conversion is unit-checked against the 8-bit
    path on upscaled planes: identical input content must produce
    identical RGB)."""
    import numpy as np
    rng = np.random.default_rng(5)
    y8 = rng.integers(0, 256, (32, 48), np.uint16)
    u8 = rng.integers(0, 256, (16, 24), np.uint16)
    v8 = rng.integers(0, 256, (16, 24), np.uint16)
    meta8 = dict(bit_depth=8, mono=False, subsampling=(1, 1),
                 matrix_coefficients=6, color_range=1)
    meta10 = dict(meta8, bit_depth=10)
    nclx = dict(matrix=6, full_range=True)
    a = avif_mod._yuv_to_rgba([y8, u8, v8], meta8, nclx)
    b = avif_mod._yuv_to_rgba([y8 * 4, u8 * 4, v8 * 4], meta10, nclx)
    # 10-bit = 4x the 8-bit code values -> same normalized floats up
    # to the (1023 vs 255*4.0117) scale and the integer bilinear
    # chroma upsample rounding at the finer scale: a few LSB
    d = np.abs(a[:, :, :3].astype(int) - b[:, :, :3].astype(int))
    assert d.max() <= 3 and d.mean() < 0.5


def test_avif_color_native_vs_numpy_oracle():
    """host_av1.c av1_color_cicp must be bit-identical to the numpy
    float32 oracle (_yuv_to_rgba_np) across bit depths, matrices,
    ranges, subsamplings, mono/identity modes, odd sizes, and
    non-contiguous (cropped-view) planes."""
    import numpy as np
    from ffpic_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for bd in (8, 10, 12):
        dt = np.uint8 if bd == 8 else np.uint16
        mx = (1 << bd) - 1
        for (sx, sy) in ((0, 0), (1, 0), (1, 1), (0, 1)):
            for limited in (False, True):
                for mc in (1, 5, 6, 9, 2):
                    h, w = 37, 53
                    ch, cw = (h + sy) >> sy, (w + sx) >> sx
                    y = rng.integers(0, mx + 1, (h, w)).astype(dt)
                    u = rng.integers(0, mx + 1, (ch, cw)).astype(dt)
                    v = rng.integers(0, mx + 1, (ch, cw)).astype(dt)
                    meta = dict(bit_depth=bd, mono=False,
                                subsampling=(sx, sy),
                                matrix_coefficients=mc,
                                color_range=0 if limited else 1)
                    a = avif_mod._yuv_to_rgba_np([y, u, v], meta, None)
                    b = native.av1_color_cicp(
                        [y, u, v], h, w, sx, sy, bd, limited, mode=0,
                        kr=avif_mod._CICP_KR_KB.get(mc, (0.299, 0.114))[0],
                        kb=avif_mod._CICP_KR_KB.get(mc, (0.299, 0.114))[1])
                    assert np.array_equal(a, b), (bd, sx, sy, limited, mc)
        # mono + identity + cropped views
        y = rng.integers(0, mx + 1, (64, 64)).astype(dt)[:41, :29]
        for limited in (False, True):
            meta = dict(bit_depth=bd, mono=True, subsampling=(0, 0),
                        matrix_coefficients=6,
                        color_range=0 if limited else 1)
            a = avif_mod._yuv_to_rgba_np([y], meta, None)
            b = native.av1_color_cicp([y], 41, 29, 0, 0, bd, limited,
                                      mode=2)
            assert np.array_equal(a, b), ("mono", bd, limited)
        g = rng.integers(0, mx + 1, (41, 29)).astype(dt)
        bb = rng.integers(0, mx + 1, (41, 29)).astype(dt)
        r = rng.integers(0, mx + 1, (41, 29)).astype(dt)
        meta = dict(bit_depth=bd, mono=False, subsampling=(0, 0),
                    matrix_coefficients=0, color_range=1)
        a = avif_mod._yuv_to_rgba_np([g, bb, r], meta, None)
        b = native.av1_color_cicp([g, bb, r], 41, 29, 0, 0, bd, False,
                                  mode=1)
        assert np.array_equal(a, b), ("identity", bd)
