"""Full HEVC inter (P/B) pixel decode, bit-exact vs libde265.

Streams are minted by driving libx265 via ctypes
(tools/x265_oracle.py) and every decoded picture is compared
plane-exact against libde265 (tools/de265_oracle.py) — two
independent production codecs.  The C reference parses inter syntax
and discards it (hevc.c:6285-6397), so this whole surface is
beyond-reference: merge/AMVP derivation (8.5.3), MC interpolation
(8.5.4), POC/DPB/RPS (8.3) and bS-aware deblocking (8.7.2.4).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from ffpic_tpu.formats import hevc as HV                 # noqa: E402

try:
    import x265_oracle as XO
    import de265_oracle as DO
    HAVE_ORACLES = XO.available() and DO.available()
except Exception:                                        # pragma: no cover
    HAVE_ORACLES = False

needs_oracles = pytest.mark.skipif(
    not HAVE_ORACLES, reason="libx265/libde265 unavailable")


def _frames(n, h, w, noise=30, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(np.linspace(0, 255, w)[None, :] +
                   np.linspace(0, 80, h)[:, None] +
                   rng.integers(0, noise, (h, w)), 0, 255) \
        .astype(np.uint8)
    cb = np.clip(128 + rng.integers(-20, 20, (h // 2, w // 2)), 0,
                 255).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, 3 * i, 1).copy()
        x0 = (10 + 5 * i) % max(1, w - 16)
        y[20:36, x0:x0 + 16] = 200          # moving patch -> real MVs
        out.append([y, np.roll(cb, i, 1).copy(),
                    np.full((h // 2, w // 2), 110, np.uint8)])
    return out


def _display_order(pics):
    """Reorder decode-order pictures to display order (POC within
    each IDR-delimited group)."""
    groups = []
    for p in pics:
        if p.poc == 0 or not groups:
            groups.append([])
        groups[-1].append(p)
    return [p for g in groups for p in sorted(g, key=lambda q: q.poc)]


def _assert_bitexact(fr, **kw):
    stream = XO.encode_frames(fr, **kw)
    ref = DO.decode_annexb(stream)
    dec = HV.SequenceDecoder()
    pics = _display_order(dec.decode_annexb(stream))
    assert len(pics) == len(ref) == len(fr)
    n_inter = 0
    for i, (p, rp) in enumerate(zip(pics, ref)):
        for c in range(len(rp)):
            h, w = rp[c].shape
            ours = p.planes[c][:h, :w]
            assert np.array_equal(ours, rp[c].astype(np.int64)), \
                (i, c, int((ours != rp[c]).sum()),
                 int(np.abs(ours - rp[c]).max()))
        if p.poc != 0:
            n_inter += 1
    assert n_inter >= len(fr) // 2      # the matrix really has inter
    return pics


BASE = {"sao": 0, "weightp": 0, "temporal-mvp": 0, "open-gop": 0,
        "no-deblock": 1, "ref": 1, "max-merge": 2}
ALL = {"sao": 1, "weightp": 0, "temporal-mvp": 1, "open-gop": 0,
       "no-deblock": 0, "ref": 3, "max-merge": 5}


@needs_oracles
@pytest.mark.parametrize("label,n,h,w,kw", [
    ("p-minimal", 4, 64, 64,
     dict(gop=8, bframes=0, qp=32, extra=BASE)),
    ("p-all-tools", 6, 96, 96,
     dict(gop=8, bframes=0, qp=30, extra=ALL)),
    ("b-pyramid-all", 8, 96, 96,
     dict(gop=8, bframes=3, qp=30, extra=ALL)),
    ("weighted-bipred", 6, 96, 96,
     dict(gop=8, bframes=2, qp=32,
          extra={**ALL, "weightp": 1, "weightb": 1})),
    ("rect-amp", 6, 96, 96,
     dict(gop=8, bframes=2, qp=28,
          extra={**ALL, "rect": 1, "amp": 1})),
    ("multi-gop-idr", 12, 96, 96,
     dict(gop=4, bframes=2, qp=32, extra=ALL)),
    ("odd-dims", 5, 68, 100,
     dict(gop=8, bframes=2, qp=30, extra=ALL)),
    ("ctu16-aq-deltaqp", 5, 96, 96,
     dict(gop=8, bframes=2, qp=30,
          extra={**ALL, "ctu": 16, "crf": 28, "aq-mode": 2})),
    ("tskip-lossless", 5, 96, 96,
     dict(gop=8, bframes=2, qp=30,
          extra={**ALL, "tskip": 1, "cu-lossless": 1})),
    ("two-slices", 4, 144, 176,
     dict(gop=8, bframes=2, qp=32,
          extra={**BASE, "temporal-mvp": 1, "max-merge": 5,
                 "ref": 3, "slices": 2, "no-deblock": 0})),
], ids=lambda v: v if isinstance(v, str) else "")
def test_inter_bitexact(label, n, h, w, kw):
    _assert_bitexact(_frames(n, h, w), **kw)


@needs_oracles
@pytest.mark.slow
def test_inter_preset_slow():
    """x265 'slow' exercises AMP + Nx2N 8x8 CUs (2-bin part_mode)
    + forced 4x4 inter TUs (DCT, not DST) + non-trivial RPS
    prediction."""
    _assert_bitexact(_frames(6, 96, 96), preset="slow", gop=8,
                     bframes=3, qp=30, extra={"open-gop": 0})


@needs_oracles
def test_sequence_decoder_motion_fields():
    """Decoded pictures expose their motion fields (TMVP state) and
    P/B pictures carry real inter motion."""
    stream = XO.encode_frames(_frames(4, 64, 64), gop=8, bframes=0,
                              qp=32, extra=BASE)
    from ffpic_tpu.coding.hevc_inter import NO_REF
    dec = HV.SequenceDecoder()
    pics = dec.decode_annexb(stream)
    assert all(p.motion is not None for p in pics)
    inter = [p for p in pics if p.poc > 0]
    assert inter
    assert any((p.motion.refpoc[0] != NO_REF).any() for p in inter)


@needs_oracles
def test_raw_annexb_file_format():
    """Raw .265 elementary streams probe + decode through the
    registry (picinfo/show surface for the inter decoder)."""
    import ffpic_tpu
    from ffpic_tpu.formats import registry

    stream = XO.encode_frames(_frames(5, 96, 96), gop=8, bframes=2,
                              qp=30, extra=ALL)
    codec = registry.probe(stream)
    assert codec.name == "HEVC"
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".265") as f:
        f.write(stream)
        f.flush()
        pic = ffpic_tpu.load(f.name)
        assert pic.width == 96 and pic.height == 96
        assert len(pic.frames) == 4      # 5 pictures total
        assert pic.meta["n_pictures"] == 5
        # skip_decode structure-only path
        meta = registry.load(f.name, skip_decode=True).meta
        assert meta["access_units"] == 5


@needs_oracles
def test_poc_lsb_wraparound_long_gop():
    """300 pictures in one GOP: slice_pic_order_cnt_lsb wraps its
    8-bit space, exercising the PicOrderCntMsb increment/decrement
    branches of 8.3.1 (plus long-run DPB management)."""
    fr = _frames(6, 64, 64)
    _assert_bitexact([fr[i % 6] for i in range(300)], gop=400,
                     bframes=2, qp=34, extra=ALL)
