"""HEVC P/B slice parse-and-skip parity (round-5 verdict item 10).

The C reference parses inter PU/MVD syntax inside its CU loop without
motion-compensating (hevc.c:6285-6397).  This suite validates the
rebuild's equivalent layer on REAL inter streams minted by driving
libx265 via ctypes (tools/x265_oracle.py): the full slice-data parse
must stay CABAC-bit-synced through every CU/PU/MVD/residual — the
decoder requires end_of_slice_segment_flag == 1 exactly at the last
CTB, so any parse desync fails loudly.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from ffpic_tpu.formats import hevc as HV                 # noqa: E402
from ffpic_tpu.coding.hevc_slice import \
    InterSliceUnsupported                                # noqa: E402

try:
    import x265_oracle as XO
    HAVE_X265 = XO.available()
except Exception:                                        # pragma: no cover
    HAVE_X265 = False

needs_x265 = pytest.mark.skipif(not HAVE_X265,
                                reason="libx265 unavailable")


def _frames(n, h, w, noise=30, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(np.linspace(0, 255, w)[None, :] +
                   np.linspace(0, 80, h)[:, None] +
                   rng.integers(0, noise, (h, w)), 0, 255) \
        .astype(np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, 3 * i, 1).copy()
        x0 = (10 + 5 * i) % max(1, w - 16)
        y[20:36, x0:x0 + 16] = 200          # moving patch -> real MVs
        out.append([y,
                    np.clip(128 + rng.integers(-20, 20,
                            (h // 2, w // 2)), 0, 255).astype(np.uint8),
                    np.full((h // 2, w // 2), 110, np.uint8)])
    return out


def _nals(d):
    out, i, starts = [], 0, []
    while i < len(d) - 3:
        if d[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    starts.append(len(d) + 3)
    return [d[a:b - 3] for a, b in zip(starts, starts[1:])
            if d[a:b - 3]]


def _run(frames, **kw):
    obus = XO.encode_frames(frames, **kw)
    sps = pps = None
    n_i = n_pb = 0
    stats_total = None
    for n in _nals(obus):
        t = (n[0] >> 1) & 0x3F
        if t == 33:
            sps = HV.parse_sps(n)
        elif t == 34:
            pps = HV.parse_pps(n)
        elif t < 32:
            try:
                HV.decode_picture(sps, pps, [n])
                n_i += 1
            except InterSliceUnsupported as e:
                n_pb += 1
                st = getattr(e, "parse_stats", None)
                assert st is not None and st["cus"] > 0
                if stats_total is None:
                    stats_total = dict(st)
                else:
                    for k in st:
                        stats_total[k] += st[k]
    return n_i, n_pb, stats_total


@needs_x265
@pytest.mark.parametrize("kw,label", [
    (dict(gop=8, bframes=0, qp=32), "p-only"),
    (dict(gop=8, bframes=3, qp=32), "b-pyramid"),
    (dict(gop=8, bframes=2, qp=28, extra={"rect": 1}), "rect"),
    (dict(gop=8, bframes=2, qp=28,
          extra={"rect": 1, "amp": 1}), "amp"),
    (dict(gop=8, bframes=0, qp=36, extra={"weightp": 1}), "weightp"),
    (dict(gop=8, bframes=3, qp=45), "skip-heavy"),
    (dict(gop=8, bframes=2, qp=30,
          extra={"temporal-mvp": 0}), "tmvp-off"),
], ids=lambda v: v if isinstance(v, str) else "")
def test_pb_parse_and_skip(kw, label):
    """Every inter picture's slice data parses bit-synced end to end
    and reports CU/PU/merge/MVD structure; intra pictures still
    decode pixels."""
    n_i, n_pb, st = _run(_frames(6, 96, 96), **kw)
    assert n_i >= 1 and n_pb >= 3, (label, n_i, n_pb)
    assert st["pus"] >= st["cus"] - st["skip_cus"] - st["intra_cus"]


@needs_x265
def test_pb_parse_reports_mvds():
    """Moving content yields non-merge PUs with explicit MVDs."""
    n_i, n_pb, st = _run(_frames(6, 192, 192), gop=8, bframes=0,
                         qp=30)
    assert n_pb >= 4
    assert st["mvds"] > 0 and st["merge_pus"] > 0


@needs_x265
def test_heif_track_keeps_intra_frames():
    """A P/B-bearing sequence still degrades typed at the picture
    level (intra frames decode, inter frames skip) — the parse layer
    must not turn conforming P/B tracks into hard failures."""
    obus = XO.encode_frames(_frames(5, 64, 64), gop=4, bframes=0,
                            qp=32)
    sps = pps = None
    n_i = n_pb = 0
    for n in _nals(obus):
        t = (n[0] >> 1) & 0x3F
        if t == 33:
            sps = HV.parse_sps(n)
        elif t == 34:
            pps = HV.parse_pps(n)
        elif t < 32:
            try:
                pic = HV.decode_picture(sps, pps, [n])
                assert pic is not None
                n_i += 1
            except InterSliceUnsupported:
                n_pb += 1
    assert n_i == 2 and n_pb == 3     # gop=4: IDR, P, P, P, IDR
