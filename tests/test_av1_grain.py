"""AV1 film grain synthesis + superres conformance vs dav1d.

Streams are minted by driving libaom's encoder via ctypes
(tools/aom_oracle.encode_frames) with the film-grain control and the
rc_superres config fields — an independent, non-self oracle chain:
libaom encodes, dav1d decodes (synthesizing grain / upscaling), and
our decoder must match bit-exactly.

The C reference has no AV1 decode at all (avif.c:382-405 stub).
"""

import ctypes
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from ffpic_tpu.formats.av1_recon import Av1Decoder  # noqa: E402

try:
    from dav1d_oracle import decode_obus
    import aom_oracle as AO
    HAVE_ORACLES = AO.available()
except Exception:                                   # pragma: no cover
    HAVE_ORACLES = False

needs_oracles = pytest.mark.skipif(
    not HAVE_ORACLES, reason="dav1d/libaom oracles unavailable")

# libaom control id enabling film-grain synthesis params in the
# bitstream (denoise/grain test level), located empirically
_GRAIN_CTRL = 112
# aom_codec_enc_cfg offsets of rc_superres_mode/denominator/
# kf_denominator (after the resize block at offset 64)
_SR_MODE_OFF = 76


def _encode(frames, bd=8, grain_level=0, sr_den=0, lag=0, speed=8):
    """encode_frames + optional grain control / superres config."""
    code = open(os.path.join(REPO, "tools", "aom_oracle.py")).read()
    if sr_den:
        anchor = ('    if lag is not None:\n'
                  '        poke("g_lag_in_frames", lag)')
        assert anchor in code
        code = code.replace(anchor, anchor + (
            '\n    import struct as _s2'
            f'\n    _s2.pack_into("<III", cfgbuf, {_SR_MODE_OFF},'
            f' 1, {sr_den}, {sr_den})'))
    if grain_level:
        fa = ('        lib.aom_codec_control(ctypes.byref(ctx), '
              '_AOME_SET_CPUUSED,\n'
              '                              ctypes.c_int(speed))')
        assert fa in code
        code = code.replace(fa, fa + (
            '\n        lib.aom_codec_control(ctypes.byref(ctx), '
            f'{_GRAIN_CTRL}, ctypes.c_int({grain_level}))'))
    ns = {}
    exec(compile(code, "aom_oracle_patched", "exec"), ns)
    return ns["encode_frames"](frames, bit_depth=bd, speed=speed,
                               lag=lag)


def _frames(n, h, w, bd, seed=2, shift=2):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    base = np.clip(np.linspace(0, mx, w)[None, :] +
                   np.linspace(0, mx // 2, h)[:, None] +
                   rng.integers(0, max(2, mx // 10), (h, w)),
                   0, mx).astype(np.uint16)
    return [[np.roll(base, shift * i, 1),
             np.full(((h + 1) // 2, (w + 1) // 2), mx // 2,
                     np.uint16),
             rng.integers(0, mx, ((h + 1) // 2, (w + 1) // 2))
             .astype(np.uint16)] for i in range(n)]


def _assert_exact(obus):
    refs = decode_obus(obus, all_frames=True)
    ours = Av1Decoder().decode_obus(obus)
    assert len(ours) == len(refs)
    for fi, ((rp, _), (op, _)) in enumerate(zip(refs, ours)):
        for pi, (a, b) in enumerate(zip(op, rp)):
            bad = int((a.astype(np.int64) != b.astype(np.int64))
                      .sum())
            assert bad == 0, f"frame {fi} plane {pi}: {bad} diffs"


@needs_oracles
@pytest.mark.parametrize("level,bd", [(1, 8), (8, 8), (25, 8),
                                      (50, 8), (8, 10)])
def test_film_grain_exact(level, bd):
    """Grain-bearing streams at several noise levels and bit depths
    decode bit-exact incl. the synthesized grain (AR templates,
    scaling LUTs, stripe/block offsets, overlap blending)."""
    _assert_exact(_encode(_frames(1, 48, 64, bd), bd=bd,
                          grain_level=level))


@needs_oracles
def test_film_grain_multiframe():
    """Inter frames with per-frame grain params (update_grain /
    ref-load path) stay exact; references store pre-grain pixels."""
    _assert_exact(_encode(_frames(3, 96, 128, 8, shift=3), bd=8,
                          grain_level=8))


@needs_oracles
def test_film_grain_odd_dims():
    _assert_exact(_encode(_frames(2, 70, 94, 8), bd=8,
                          grain_level=50))


@needs_oracles
@pytest.mark.parametrize("den,h,w,bd", [(16, 64, 128, 8),
                                        (12, 64, 96, 8),
                                        (16, 64, 128, 10),
                                        (14, 62, 90, 8),
                                        (9, 94, 122, 8)])
def test_superres_exact(den, h, w, bd):
    """Superres stills: horizontal upscale (normative 64-phase
    8-tap filters) between CDEF and restoration, all denominators /
    odd sizes / bit depths."""
    _assert_exact(_encode(_frames(1, h, w, bd), bd=bd, sr_den=den))


@needs_oracles
def test_superres_with_grain():
    _assert_exact(_encode(_frames(1, 64, 128, 8), bd=8,
                          grain_level=8, sr_den=16))


@needs_oracles
@pytest.mark.parametrize("sub,level,bd", [("444", 8, 8),
                                          ("444", 25, 8),
                                          ("422", 8, 8),
                                          ("420", 40, 10)])
def test_film_grain_subsampling(sub, level, bd):
    """Grain templates at every chroma geometry (4:4:4 82x73,
    4:2:2 44x73, 4:2:0 44x38) incl. the luma-correlated AR term."""
    rng = np.random.default_rng(6)
    mx = (1 << bd) - 1
    h = w = 64
    base = np.clip(np.linspace(0, mx, w)[None, :] +
                   np.linspace(0, mx // 2, h)[:, None] +
                   rng.integers(0, max(2, mx // 10), (h, w)),
                   0, mx).astype(np.uint16)
    frames = []
    for i in range(2):
        y = np.roll(base, 3 * i, 1)
        if sub == "444":
            u, v = np.roll(base, -3 * i, 1), \
                np.full((h, w), mx // 2, np.uint16)
        elif sub == "422":
            u = np.roll(base, -3 * i, 1)[:, ::2].copy()
            v = np.full((h, w // 2), mx // 2, np.uint16)
        else:
            u = np.full((h // 2, w // 2), mx // 2, np.uint16)
            v = rng.integers(0, mx, (h // 2, w // 2)) \
                .astype(np.uint16)
        frames.append([y, u, v])
    code = open(os.path.join(REPO, "tools", "aom_oracle.py")).read()
    fa = ('        lib.aom_codec_control(ctypes.byref(ctx), '
          '_AOME_SET_CPUUSED,\n'
          '                              ctypes.c_int(speed))')
    assert fa in code
    code = code.replace(fa, fa + (
        '\n        lib.aom_codec_control(ctypes.byref(ctx), '
        f'{_GRAIN_CTRL}, ctypes.c_int({level}))'))
    ns = {}
    exec(compile(code, "aom_oracle_patched", "exec"), ns)
    obus = ns["encode_frames"](frames, bit_depth=bd, speed=6,
                               lag=0, subsampling=sub)
    _assert_exact(obus)


@needs_oracles
@pytest.mark.parametrize("h,w", [(33, 33), (64, 65), (31, 47)])
def test_film_grain_truly_odd_width(h, w):
    """ODD luma width/height in 4:2:0: the chroma blend's 2x luma
    column pairing hits lumaX+1 == w; spec 7.18.3.6 clamps to the
    plane edge (replicate last column).  Crashed with a broadcast
    ValueError before round 5 (ADVICE finding)."""
    _assert_exact(_encode(_frames(2, h, w, 8), bd=8,
                          grain_level=50))


@needs_oracles
@pytest.mark.parametrize("den,bd,lag", [(16, 8, 0), (9, 8, 0),
                                        (12, 8, 19), (14, 10, 0)])
def test_superres_inter_exact(den, bd, lag):
    """Superres INTER frames: every reference is scaled (stored
    upscaled vs coded downscaled geometry), so each inter block
    takes the scaled-convolve path AND the motion-mode read is
    gated to the OBMC bool (libaom av1_is_scaled compares the
    CODED width — round 5 fixed the parse gate comparing
    upscaled_width, which desynced every warp-enabled superres
    stream).  Frame-exact vs dav1d incl. deep-GOP pyramids."""
    n = 5 if lag else 3
    _assert_exact(_encode(_frames(n, 64, 128, bd, shift=5), bd=bd,
                          sr_den=den, lag=lag, speed=6))
