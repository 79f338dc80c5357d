"""AV1 still-picture ENCODER (coding/av1_enc.py) + AVIF mux tests.

The C reference has no AV1 layer at all; this encoder exists to close
the AVIF write side (`transcode -c avif`) and to manufacture
conformance streams the image lacks encoders for — in particular
10-BIT AV1, whose decode paths get their dav1d cross-check here (no
other encoder in this image can produce 10-bit AV1).

Oracles: dav1d (pixel-exact decode), libaom's decoder (STRICT
conformance accept/reject — it validates trailing bits and symbol
overreads dav1d tolerates, and rejected several encoder bring-up
bugs), and our own decoder (lossless roundtrips must be EXACT).
"""
import numpy as np
import pytest

from ffpic_tpu.coding.av1_enc import encode_av1
from ffpic_tpu.formats.av1_recon import decode_frame
from tools.dav1d_oracle import decode_obus
from tools.aom_oracle import aom_accepts, available as aom_available


def _rt(planes, bd=8, sub=(1, 1), q=0, mono=False):
    obus = encode_av1(planes, bd, sub, q, monochrome=mono)
    ours, _ = decode_frame(obus, apply_filters=True)
    want, _ = decode_obus(obus)
    for i, (a, b) in enumerate(zip(ours, want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"plane {i} vs dav1d")
    if aom_available():
        ok, err = aom_accepts(obus)
        assert ok, f"libaom rejects our stream: {err}"
    return obus, ours


def test_msac_encoder_roundtrip():
    """Symbol-level: random transcripts through MsacEnc -> Msac."""
    import random
    from ffpic_tpu.coding.av1_msac_enc import MsacEnc
    from ffpic_tpu.coding.av1_msac import Msac
    rng = random.Random(11)
    for _ in range(50):
        enc = MsacEnc(allow_update=True)
        def fresh():
            return [[24000, 16000, 8000, 0, 0], [20000, 0, 0],
                    [30000, 26000, 21000, 15000, 9000, 4000, 0, 0]]
        ce = fresh()
        ops = []
        for _ in range(rng.randrange(1, 100)):
            k = rng.randrange(4)
            if k == 0:
                c = rng.randrange(3)
                s = rng.randrange(len(ce[c]) - 1)
                enc.encode_symbol(ce[c], s)
                ops.append(("s", c, s))
            elif k == 1:
                b = rng.randrange(2)
                enc.encode_bool(b)
                ops.append(("b", b))
            elif k == 2:
                nb = rng.randrange(1, 13)
                v = rng.randrange(1 << nb)
                enc.encode_literal(v, nb)
                ops.append(("l", v, nb))
            else:
                v = rng.randrange(3000)
                enc.encode_golomb(v)
                ops.append(("g", v))
        dec = Msac(enc.done(), allow_update=True)
        cd = fresh()
        for op in ops:
            if op[0] == "s":
                assert dec.decode_symbol(cd[op[1]]) == op[2]
            elif op[0] == "b":
                assert dec.decode_bool(1 << 14) == op[1]
            elif op[0] == "l":
                assert dec.decode_literal(op[2]) == op[1]
            else:
                assert dec.decode_golomb() == op[1]


def test_av1_enc_lossless_exact_roundtrip():
    """qindex 0 (WHT) must reproduce the input exactly — incl. odd
    dims (frame-edge forced partitions) and 4:2:0/4:4:4/mono."""
    rng = np.random.default_rng(0)
    for (w, h), sub, mono in (((64, 48), (0, 0), False),
                              ((33, 17), (1, 1), False),
                              ((75, 53), (0, 0), False),
                              ((24, 24), (1, 1), True)):
        y = rng.integers(0, 256, (h, w), np.uint8)
        if mono:
            planes = [y]
        else:
            cw, ch = (w + sub[0]) >> sub[0], (h + sub[1]) >> sub[1]
            planes = [y] + [rng.integers(0, 256, (ch, cw), np.uint8)
                            for _ in range(2)]
        _, ours = _rt(planes, 8, sub, 0, mono)
        for a, p in zip(ours, planes):
            np.testing.assert_array_equal(np.asarray(a), p)


def test_av1_enc_lossy_dav1d_exact():
    """Lossy streams decode bit-exactly in dav1d and pass libaom."""
    rng = np.random.default_rng(1)
    for q in (20, 80, 160, 250):
        y = rng.integers(0, 256, (48, 80), np.uint8)
        u = rng.integers(0, 256, (24, 40), np.uint8)
        v = rng.integers(0, 256, (24, 40), np.uint8)
        _rt([y, u, v], 8, (1, 1), q)


def test_av1_enc_10bit_oracle():
    """THE 10-bit conformance oracle: no other encoder in this image
    emits 10-bit AV1, so these streams are what validates the
    decoder's 10-bit paths (transforms, dequant, edge prediction)
    against dav1d — lossless exact and lossy bit-exact."""
    rng = np.random.default_rng(2)
    y = rng.integers(0, 1024, (40, 56), np.uint16)
    u = rng.integers(0, 1024, (20, 28), np.uint16)
    v = rng.integers(0, 1024, (20, 28), np.uint16)
    _, ours = _rt([y, u, v], 10, (1, 1), 0)
    for a, p in zip(ours, (y, u, v)):
        np.testing.assert_array_equal(np.asarray(a), p)
    for q in (60, 180):
        _rt([y, u, v], 10, (1, 1), q)
    # 10-bit 4:4:4 + mono
    _rt([y, y.copy(), y.copy()], 10, (0, 0), 40)
    _rt([y], 10, (1, 1), 90, mono=True)


def test_av1_enc_dim_matrix():
    """Dims sweep incl. 4x4 minimum, odd mi alignment (8px mi grid),
    and >64px multi-superblock frames."""
    rng = np.random.default_rng(3)
    for w, h in ((4, 4), (8, 4), (17, 16), (20, 44), (61, 61),
                 (128, 72), (96, 200)):
        y = rng.integers(0, 256, (h, w), np.uint8)
        _rt([y], 8, (1, 1), 50, mono=True)


def test_avif_encode_transcode():
    """Pic -> AVIF: quality=100 is a mathematically lossless RGB
    roundtrip (CICP identity), decoded identically by our decoder
    AND an independent one (PIL/libavif); lossy stays sane."""
    from ffpic_tpu.formats import registry
    from ffpic_tpu.formats.pic import Pic
    from PIL import Image
    import ffpic_tpu as ff
    import tempfile, os
    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (72, 96, 3), np.uint8)
    pix = np.dstack([rgb, np.full((72, 96, 1), 255, np.uint8)])
    pic = Pic(codec="BMP", width=96, height=72, pixels=pix)
    data = registry.encode(pic, "AVIF", quality=100)
    with tempfile.NamedTemporaryFile(suffix=".avif",
                                     delete=False) as f:
        f.write(data)
        fn = f.name
    try:
        pic2 = ff.load(fn)
        got = np.asarray(pic2.pixels)[..., :3]
        np.testing.assert_array_equal(got, rgb)
        pil = np.asarray(Image.open(fn).convert("RGB"))
        np.testing.assert_array_equal(pil, rgb)
        # lossy: smooth content, sanity PSNR + independent decode
        gx = np.linspace(0, 255, 96)[None, :]
        gy = np.linspace(0, 255, 72)[:, None]
        smooth = np.stack([(gx + gy) / 2] * 3, -1).astype(np.uint8)
        pic_s = Pic(codec="BMP", width=96, height=72,
                    pixels=np.dstack([smooth,
                                      np.full((72, 96, 1), 255,
                                              np.uint8)]))
        lossy = registry.encode(pic_s, "AVIF", quality=60)
        with open(fn, "wb") as f:
            f.write(lossy)
        pic3 = ff.load(fn)
        d = (np.asarray(pic3.pixels)[..., :3].astype(float)
             - smooth.astype(float))
        psnr = 10 * np.log10(255 * 255 / max((d * d).mean(), 1e-9))
        assert psnr > 30, psnr
        pil = np.asarray(Image.open(fn).convert("RGB")).astype(int)
        assert np.abs(pil
                      - np.asarray(pic3.pixels)[..., :3].astype(int)
                      ).max() <= 3
    finally:
        os.unlink(fn)
