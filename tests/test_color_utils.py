"""RGBA->HSV + alpha blend (ops/color_utils) vs a scalar oracle
mirroring the reference's integer formulation (colorspace.c:999-1038:
C truncating division, r/g/b tie priority, s = 255 - 255*cmin/cmax)."""

import numpy as np

from ffpic_tpu.ops.color_utils import alpha_blend, rgba_to_hsv


def _hsv_scalar(r, g, b):
    cmax = max(r, g, b)
    cmin = min(r, g, b)
    d = cmax - cmin

    def tdiv(n, dd):                    # C int division
        q = abs(n) // dd
        return -q if n < 0 else q
    if d == 0:
        h = 0
    elif cmax == r:
        h = tdiv(60 * (g - b), d) + (0 if g >= b else 360)
    elif cmax == g:
        h = tdiv(60 * (b - r), d) + 120
    else:
        h = tdiv(60 * (r - g), d) + 240
    s = 0 if cmax == 0 else 255 - (255 * cmin) // cmax
    return h, s, cmax


def test_hsv_matches_scalar_oracle():
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (64, 64, 4), dtype=np.uint8)
    # force interesting cases: grays, zeros, saturated channels, ties
    rgba[0, :8] = [0, 0, 0, 255]
    rgba[0, 8:16] = [200, 200, 200, 255]
    rgba[1, :8] = [255, 0, 0, 255]
    rgba[1, 8:16] = [0, 255, 255, 255]
    rgba[2, :8] = [100, 100, 50, 255]    # r==g tie
    h, s, v = rgba_to_hsv(rgba)
    assert h.dtype == np.uint16 and s.dtype == np.uint8
    for y in range(0, 64, 7):
        for x in range(0, 64, 5):
            r, g, b = (int(rgba[y, x, 0]), int(rgba[y, x, 1]),
                       int(rgba[y, x, 2]))
            eh, es, ev = _hsv_scalar(r, g, b)
            assert (int(h[y, x]), int(s[y, x]), int(v[y, x])) == \
                (eh, es, ev), (r, g, b)


def test_hsv_hue_range():
    # the reference's integer hue can land exactly on 360 (r max with
    # g just below b: 60*(g-b)/d truncates to 0, then +360) — keep
    # that quirk rather than wrapping
    rng = np.random.default_rng(4)
    rgba = rng.integers(0, 256, (128, 128, 4), dtype=np.uint8)
    h, s, v = rgba_to_hsv(rgba)
    assert int(h.max()) <= 360 and int(h.min()) >= 0


def test_alpha_blend_extremes():
    fg = np.full((4, 4, 4), 200, np.uint8)
    bg = np.zeros((4, 4, 4), np.uint8)
    bg[..., 1:] = 90
    # bg alpha channel 0 -> output = bg, alpha 0
    out = alpha_blend(fg, bg)
    assert (out[..., 1] == 90).all() and (out[..., 3] == 0).all()
    bg[..., 0] = 255                    # alpha 1 -> foreground kept
    out = alpha_blend(fg, bg)
    assert (out[..., 1] == 200).all() and (out[..., 3] == 255).all()


def test_alpha_blend_mid():
    fg = np.full((2, 2, 4), 100, np.uint8)
    bg = np.full((2, 2, 4), 50, np.uint8)
    bg[..., 0] = 128
    out = alpha_blend(fg, bg)
    a = 128 / 255.0
    exp = np.uint8(100 * a + (1 - a) * 50)
    assert (out[..., 1] == exp).all()
