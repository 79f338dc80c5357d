"""In-suite quick subset of the randomized AV1 conformance sweep
(tools/av1_sweep.py) — round-5 verdict item: the strongest AV1
conformance evidence must be reproducible by `pytest` in a fresh
checkout instead of living in commit messages.

10 still + 4 inter + 1 superres-inter configs, all minted by driving
libaom's encoder (tools/aom_oracle.encode_frames) and compared
frame-exact against dav1d.  The full sweep (95 configs) remains in
tools/av1_sweep.py for deep campaigns.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tests"))

from ffpic_tpu.formats.av1_recon import Av1Decoder  # noqa: E402

try:
    from dav1d_oracle import decode_obus
    import aom_oracle as AO
    HAVE = AO.available()
except Exception:                                   # pragma: no cover
    HAVE = False

needs = pytest.mark.skipif(not HAVE, reason="dav1d/libaom unavailable")


def _yuv(n, h, w, bd, seed, shift, sub="420"):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    base = np.clip(np.linspace(0, mx, w)[None, :] +
                   np.linspace(0, mx // 2, h)[:, None] +
                   rng.integers(0, max(2, mx // 8), (h, w)),
                   0, mx).astype(np.uint16)
    cw = w if sub == "444" else (w + 1) // 2
    ch = h if sub == "420" else h
    ch = (h + 1) // 2 if sub == "420" else h
    out = []
    for i in range(n):
        out.append([np.roll(base, shift * i, 1),
                    np.full((ch, cw), mx // 2, np.uint16),
                    rng.integers(0, mx, (ch, cw)).astype(np.uint16)])
    return out


def _check(obus, label):
    refs = decode_obus(obus, all_frames=True)
    ours = Av1Decoder().decode_obus(obus)
    assert len(ours) == len(refs), label
    for fi, ((rp, _), (op, _)) in enumerate(zip(refs, ours)):
        for pi, (a, b) in enumerate(zip(op, rp)):
            bad = int((a.astype(np.int64) != b.astype(np.int64))
                      .sum())
            assert bad == 0, f"{label} f{fi} p{pi}: {bad} px"


STILLS = [
    # (h, w, bd, q, speed, sub, seed)
    (64, 64, 8, 20, 6, "420", 1),
    (64, 64, 8, 50, 8, "420", 2),
    (128, 96, 8, 35, 6, "420", 3),
    (96, 128, 8, 60, 4, "420", 4),
    (70, 94, 8, 40, 6, "420", 5),      # odd dims
    (64, 64, 10, 40, 6, "420", 6),     # 10-bit
    (64, 64, 8, 40, 6, "444", 7),      # 4:4:4
    (64, 64, 8, 40, 6, "422", 8),      # 4:2:2
    (192, 192, 8, 30, 6, "420", 9),    # multi-SB
    (64, 64, 12, 40, 6, "420", 10),    # 12-bit professional
]


@needs
@pytest.mark.parametrize("cfg", STILLS,
                         ids=[f"{h}x{w}-bd{bd}-q{q}-{sub}"
                              for (h, w, bd, q, sp, sub, sd)
                              in STILLS])
def test_sweep_still(cfg):
    h, w, bd, q, speed, sub, seed = cfg
    frames = _yuv(1, h, w, bd, seed, 0, sub)
    obus = AO.encode_frames(frames, bit_depth=bd, speed=speed, q=q,
                            subsampling=sub)
    _check(obus, f"still {cfg}")


INTERS = [
    # (n, h, w, bd, shift, lag, speed)
    (3, 64, 64, 8, 3, 0, 6),
    (5, 48, 48, 8, 5, 5, 6),
    (5, 64, 64, 8, 7, 19, 6),          # deep GOP
    (4, 64, 96, 10, 5, 5, 8),          # 10-bit inter
]


@needs
@pytest.mark.parametrize("cfg", INTERS,
                         ids=[f"n{n}-{h}x{w}-bd{bd}-lag{lag}"
                              for (n, h, w, bd, sh, lag, sp)
                              in INTERS])
def test_sweep_inter(cfg):
    n, h, w, bd, shift, lag, speed = cfg
    obus = AO.encode_frames(_yuv(n, h, w, bd, 11 + n, shift),
                            bit_depth=bd, speed=speed, lag=lag)
    _check(obus, f"inter {cfg}")


@needs
def test_sweep_superres_inter():
    from test_av1_grain import _encode, _frames
    obus = _encode(_frames(4, 64, 128, 8, shift=5), bd=8, sr_den=14,
                   lag=0, speed=6)
    _check(obus, "superres-inter den14")
