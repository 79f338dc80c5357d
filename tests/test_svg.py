"""SVG rasterizer tests (beyond reference: svg.c parses the DOM only).

Oracle strategy: no SVG renderer exists in this image, so the tests
are analytic — axis-aligned fills must be exact, curved/transformed
areas must integrate to their closed-form values, and colors/gradients
are checked at known sample points.
"""

import math

import numpy as np
import pytest

import ffpic_tpu
from ffpic_tpu.formats.svg_raster import (fill_coverage, parse_color,
                                          parse_path, parse_transform)


def _render(body, w=64, h=64, extra=""):
    svg = (f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
           f'height="{h}" {extra}>{body}</svg>').encode()
    pic = ffpic_tpu.load(svg)
    assert pic.codec == "SVG"
    return pic.np_pixels()


def area(px):
    return float(px[:, :, 3].astype(np.float64).sum() / 255.0)


class TestColors:
    def test_hex_forms(self):
        assert parse_color("#f00") == (255, 0, 0, 1.0)
        assert parse_color("#00ff00") == (0, 255, 0, 1.0)
        r, g, b, a = parse_color("#0000ff80")
        assert (r, g, b) == (0, 0, 255) and abs(a - 128 / 255) < 1e-6

    def test_rgb_forms(self):
        assert parse_color("rgb(1,2,3)") == (1.0, 2.0, 3.0, 1.0)
        r, g, b, a = parse_color("rgba(10, 20, 30, 0.5)")
        assert (r, g, b, a) == (10.0, 20.0, 30.0, 0.5)
        r, g, b, _ = parse_color("rgb(100%, 0%, 50%)")
        assert r == 255.0 and g == 0.0 and abs(b - 127.5) < 1e-9

    def test_named_and_none(self):
        assert parse_color("rebeccapurple") == (102.0, 51.0, 153.0, 1.0)
        assert parse_color("Red") == (255.0, 0.0, 0.0, 1.0)
        assert parse_color("none") is None

    def test_url_reference(self):
        assert parse_color("url(#grad1)") == ("url", "grad1")


class TestFillCoverage:
    def test_axis_aligned_rect_exact(self):
        cov = fill_coverage([[(2, 3), (12, 3), (12, 9), (2, 9)]], 16, 16)
        assert cov[5, 5] == 1.0
        assert cov[2, 5] == 0.0          # above
        assert abs(cov.sum() - 60.0) < 1e-4

    def test_half_pixel_aa(self):
        cov = fill_coverage([[(0, 0), (4.5, 0), (4.5, 4), (0, 4)]], 8, 8)
        assert cov[1, 3] == 1.0
        assert abs(cov[1, 4] - 0.5) < 1e-6
        assert cov[1, 5] == 0.0

    def test_evenodd_hole(self):
        outer = [(1, 1), (13, 1), (13, 13), (1, 13)]
        inner = [(5, 5), (9, 5), (9, 9), (5, 9)]
        cov = fill_coverage([outer, inner], 16, 16, evenodd=True)
        assert cov[7, 7] == 0.0
        assert cov[3, 3] == 1.0

    def test_nonzero_opposite_winding_hole(self):
        outer = [(1, 1), (13, 1), (13, 13), (1, 13)]
        inner = [(5, 5), (5, 9), (9, 9), (9, 5)]     # reversed
        cov = fill_coverage([outer, inner], 16, 16, evenodd=False)
        assert cov[7, 7] == 0.0
        assert cov[3, 3] == 1.0


class TestShapes:
    def test_rect_fill_exact(self):
        px = _render('<rect x="8" y="8" width="16" height="16" '
                     'fill="#ff0000"/>')
        assert tuple(px[16, 16]) == (255, 0, 0, 255)
        assert px[4, 4, 3] == 0
        assert abs(area(px) - 256.0) < 0.5

    def test_circle_area(self):
        px = _render('<circle cx="32" cy="32" r="20" fill="blue"/>')
        assert tuple(px[32, 32, :3]) == (0, 0, 255)
        expect = math.pi * 400.0
        assert abs(area(px) - expect) < expect * 0.01

    def test_ellipse_area(self):
        px = _render('<ellipse cx="32" cy="32" rx="24" ry="10" '
                     'fill="lime"/>')
        expect = math.pi * 24 * 10
        assert abs(area(px) - expect) < expect * 0.01

    def test_polygon_triangle(self):
        px = _render('<polygon points="0,0 32,0 0,32" fill="black"/>')
        assert abs(area(px) - 512.0) < 6.0
        assert px[5, 5, 3] == 255
        assert px[30, 30, 3] == 0

    def test_line_stroke_band(self):
        px = _render('<line x1="0" y1="32" x2="64" y2="32" '
                     'stroke="black" stroke-width="8"/>')
        col = px[:, 20, 3]
        assert col[32] == 255 and col[29] == 255
        assert col[20] == 0 and col[44] == 0
        assert abs(area(px) - 64 * 8) < 16.0

    def test_rounded_rect_smaller_than_sharp(self):
        sharp = _render('<rect x="8" y="8" width="40" height="40"/>')
        round_ = _render('<rect x="8" y="8" width="40" height="40" '
                         'rx="10"/>')
        corner_loss = (4 - math.pi) * 100.0
        assert abs((area(sharp) - area(round_)) - corner_loss) < 4.0


class TestPaths:
    def test_parse_path_lines(self):
        subs, closed = parse_path("M1 2 L3 4 l1 0 H10 V8 Z")
        assert closed == [True]
        assert subs[0][0] == (1.0, 2.0)
        assert subs[0][-1] == (1.0, 2.0)
        assert (10.0, 8.0) in subs[0]

    def test_arc_flags_compact(self):
        # flags written without separators: "a1 1 0 0110 0" style
        subs, _ = parse_path("M0 0 A5 5 0 0110 0")
        assert len(subs[0]) > 3
        assert abs(subs[0][-1][0] - 10.0) < 1e-9

    def test_path_triangle_fill(self):
        px = _render('<path d="M0 0 L32 0 L0 32 Z"/>')
        assert abs(area(px) - 512.0) < 6.0

    def test_cubic_circle_approx(self):
        # four-arc cubic circle, r=20 at (32,32)
        k = 20 * 0.5522847498
        d = (f"M32 12 C{32+k} 12 52 {32-k} 52 32 "
             f"C52 {32+k} {32+k} 52 32 52 "
             f"C{32-k} 52 12 {32+k} 12 32 "
             f"C12 {32-k} {32-k} 12 32 12 Z")
        px = _render(f'<path d="{d}"/>')
        expect = math.pi * 400.0
        assert abs(area(px) - expect) < expect * 0.015

    def test_quadratic_parabola(self):
        # area under quad bezier (0,32)-(32,-32)-(64,32) above y=32:
        # parabola peak at y=0, area = 2/3 * base * height
        px = _render('<path d="M0 32 Q32 -32 64 32 Z"/>')
        expect = 2.0 / 3.0 * 64 * 32
        assert abs(area(px) - expect) < expect * 0.02

    def test_evenodd_donut(self):
        px = _render('<path fill-rule="evenodd" d="M32 4 A28 28 0 1 0 '
                     '32.001 4 Z M32 20 A12 12 0 1 0 32.001 20 Z"/>')
        assert px[32, 32, 3] == 0            # hole
        assert px[10, 32, 3] == 255          # ring
        expect = math.pi * (28 * 28 - 12 * 12)
        assert abs(area(px) - expect) < expect * 0.02


class TestTransforms:
    def test_parse_matrix(self):
        m = parse_transform("matrix(1 2 3 4 5 6)")
        assert np.allclose(m, [[1, 3, 5], [2, 4, 6]])

    def test_translate_rect(self):
        px = _render('<rect x="0" y="0" width="8" height="8" '
                     'transform="translate(16 24)"/>')
        assert px[28, 20, 3] == 255
        assert px[4, 4, 3] == 0

    def test_rotate_about_center(self):
        px = _render('<rect x="24" y="8" width="16" height="48" '
                     'transform="rotate(90 32 32)"/>')
        # rotating the tall rect 90deg about center -> wide rect
        assert px[32, 10, 3] == 255 and px[32, 54, 3] == 255
        assert px[10, 32, 3] == 0 and px[54, 32, 3] == 0

    def test_scale_doubles_area(self):
        a1 = area(_render('<circle cx="16" cy="16" r="8"/>'))
        a2 = area(_render('<circle cx="16" cy="16" r="8" '
                          'transform="scale(2)"/>'))
        assert abs(a2 - 4 * a1) < a1 * 0.05

    def test_nested_group_transforms(self):
        px = _render('<g transform="translate(8 8)">'
                     '<g transform="scale(2)">'
                     '<rect x="4" y="4" width="8" height="8"/>'
                     '</g></g>')
        # rect covers user 4..12 scaled->8..24 translated->16..32
        assert px[20, 20, 3] == 255
        assert px[34, 34, 3] == 0
        assert abs(area(px) - 256.0) < 1.0


class TestPaintAttributes:
    def test_fill_opacity_blend(self):
        px = _render('<rect width="64" height="64" fill="#102030"/>'
                     '<rect width="64" height="64" fill="#405060" '
                     'fill-opacity="0.5"/>')
        r, g, b, a = px[32, 32]
        assert a == 255
        assert abs(int(r) - (0x10 + 0x40) // 2) <= 1
        assert abs(int(b) - (0x30 + 0x60) // 2) <= 1

    def test_group_opacity_inherited(self):
        px = _render('<g opacity="0.5"><rect width="64" height="64" '
                     'fill="black"/></g>')
        assert abs(int(px[32, 32, 3]) - 128) <= 1

    def test_style_attribute_wins(self):
        px = _render('<rect width="64" height="64" fill="red" '
                     'style="fill:blue"/>')
        assert tuple(px[32, 32, :3]) == (0, 0, 255)

    def test_inherited_fill_from_group(self):
        px = _render('<g fill="green"><rect width="64" height="64"/></g>')
        assert tuple(px[32, 32, :3]) == (0, 128, 0)

    def test_stroke_on_rect_outline(self):
        px = _render('<rect x="16" y="16" width="32" height="32" '
                     'fill="none" stroke="red" stroke-width="4"/>')
        assert px[32, 32, 3] == 0                 # unfilled center
        assert tuple(px[16, 32, :3]) == (255, 0, 0)  # top edge mid
        assert px[32, 16, 3] == 255               # left edge mid

    def test_display_none_skipped(self):
        px = _render('<rect width="64" height="64" display="none"/>')
        assert area(px) == 0.0


class TestGradients:
    def test_linear_endpoints(self):
        px = _render(
            '<defs><linearGradient id="g" x1="0" y1="0" x2="1" y2="0">'
            '<stop offset="0" stop-color="#000000"/>'
            '<stop offset="1" stop-color="#ff0000"/>'
            '</linearGradient></defs>'
            '<rect width="64" height="64" fill="url(#g)"/>')
        assert px[32, 1, 0] < 10
        assert px[32, 62, 0] > 245
        mid = int(px[32, 32, 0])
        assert 108 <= mid <= 148
        assert px[32, 32, 3] == 255

    def test_radial_center_to_edge(self):
        px = _render(
            '<defs><radialGradient id="g">'
            '<stop offset="0" stop-color="white"/>'
            '<stop offset="1" stop-color="black"/>'
            '</radialGradient></defs>'
            '<rect width="64" height="64" fill="url(#g)"/>')
        assert px[32, 32, 0] > 240
        assert px[32, 62, 0] < 60

    def test_userspace_gradient(self):
        px = _render(
            '<defs><linearGradient id="g" gradientUnits="userSpaceOnUse" '
            'x1="0" y1="0" x2="64" y2="0">'
            '<stop offset="0" stop-color="blue"/>'
            '<stop offset="1" stop-color="yellow"/>'
            '</linearGradient></defs>'
            '<rect width="64" height="64" fill="url(#g)"/>')
        assert px[5, 2, 2] > 240 and px[5, 2, 0] < 15
        assert px[5, 62, 0] > 240 and px[5, 62, 2] < 15


class TestDocument:
    def test_viewbox_scaling(self):
        px = _render('<rect x="0" y="0" width="10" height="10"/>',
                     extra='viewBox="0 0 32 32"')
        # 10/32 of 64 = 20 px square
        assert abs(area(px) - 400.0) < 8.0

    def test_use_and_defs(self):
        px = _render('<defs><rect id="r" width="8" height="8"/></defs>'
                     '<use href="#r" x="16" y="16"/>')
        assert px[20, 20, 3] == 255
        assert px[4, 4, 3] == 0
        assert abs(area(px) - 64.0) < 1.0

    def test_registry_probe_and_load(self):
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="8" '
               b'height="8"><rect width="8" height="8" fill="red"/></svg>')
        pic = ffpic_tpu.load(svg)
        assert pic.codec == "SVG"
        assert pic.np_pixels().shape == (8, 8, 4)

    def test_skip_decode_structure_only(self):
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="8" '
               b'height="8"><circle r="4"/></svg>')
        pics = ffpic_tpu.load(svg, skip_decode=True)
        p = pics if not isinstance(pics, list) else pics[0]
        assert p.meta["elements"]["circle"] == 1

    def test_malformed_path_no_crash(self):
        px = _render('<path d="M garbage !! 12 13 L"/>'
                     '<rect width="4" height="4" fill="red"/>')
        assert px[1, 1, 3] == 255

    def test_huge_dimensions_rejected(self):
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" '
               b'width="999999" height="2"><rect/></svg>')
        with pytest.raises(Exception):
            ffpic_tpu.load(svg)

    def test_transcode_svg_to_png(self, tmp_path):
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="16" '
               b'height="16"><circle cx="8" cy="8" r="6" '
               b'fill="orange"/></svg>')
        pic = ffpic_tpu.load(svg)
        from ffpic_tpu.formats import png
        data = png.encode(pic)
        from PIL import Image
        import io
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        assert np.array_equal(back, pic.np_pixels())
