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


def test_heif_irot_rotation(tmp_path):
    """irot property is applied (the reference parses but ignores it)."""
    import struct as st
    pic, rgba = _pic(64, 32, seed=6)
    heic = bytearray(ffpic_tpu.encode(pic, "heif", qp=20))
    # splice an irot box into ipco and associate: simpler — decode the
    # unrotated file, then patch: build container manually via heif_enc
    from ffpic_tpu.formats import heif_enc as he
    from ffpic_tpu.formats.heif_enc import (_box, _full, _hvcc, _ispe,
                                            rgb_to_yuv420, _pad_planes,
                                            _encode_tile, EncPolicy)
    y, u, v = rgb_to_yuv420(np.asarray(pic.pixels))
    y, u, v, _, _ = _pad_planes(y, u, v)
    policy = EncPolicy(seed=0, split_prob=0.3, tt_split_prob=0.2,
                       nxn_prob=0.1, mode_candidates=(0, 1, 10, 26))
    idr, sps_r, pps_r = _encode_tile((y, u, v), 20, policy)
    irot = _box("irot", bytes((1,)))          # 90 degrees ccw
    items = [(1, b"hvc1", st.pack(">I", len(idr)) + idr, [
        (_box("hvcC", _hvcc(sps_r, pps_r)), True),
        (_ispe(64, 32), False), (irot, False)])]
    blob = he._assemble(items, [], 1)
    out = ffpic_tpu.load(blob)
    dec = np.asarray(out.pixels)
    assert dec.shape[:2] == (64, 32)          # rotated dims
    assert out.meta.get("rotation") == 90


def test_heif_image_sequence():
    """moov/trak hvc1 sequences decode to frames (heif.c:431-462
    parity; frames hang off pic.frames via the registry)."""
    from ffpic_tpu.formats.heif_enc import encode_heif_sequence
    frames_in = []
    rng = np.random.default_rng(8)
    for k in range(3):
        pic, _ = _pic(48, 32, seed=10 + k)
        frames_in.append(pic)
    heic = encode_heif_sequence(frames_in, qp=22)
    out = ffpic_tpu.load(heic)
    assert out.meta["sequence"] is True
    assert out.n_frames >= 3 or len(out.frames or []) == 3
    for k, fr in enumerate(out.frames[:3]):
        dec = np.asarray(fr.pixels)[:, :, :3]
        src = np.asarray(frames_in[k].pixels)[:, :, :3]
        assert _psnr(dec[:32, :48], src) > 34


def test_heif_colr_nclx_written_and_parsed():
    # encoder declares what rgb_to_yuv420 produces: BT.601 full range
    pic, _ = _pic(48, 32, seed=9)
    data = ffpic_tpu.encode(pic, "heif", qp=22)
    from ffpic_tpu.formats import heif
    s = heif.parse_structure(data)
    props = s["items"][s["primary"]]["properties"]
    assert props["nclx"] == dict(primaries=1, transfer=13, matrix=5,
                                 full_range=True)


def test_heif_colr_bt709_limited_applied():
    # patch the colr box to BT.709 limited range (the wild-HEIC norm)
    # and check load() applies the 709 limited-range conversion
    import struct
    from ffpic_tpu.formats import heif
    pic, _ = _pic(48, 32, seed=10)
    data = ffpic_tpu.encode(pic, "heif", qp=20)
    old = b"nclx" + struct.pack(">HHHB", 1, 13, 5, 0x80)
    new = b"nclx" + struct.pack(">HHHB", 1, 1, 1, 0x00)
    assert data.count(old) == 1
    patched = data.replace(old, new)

    got = ffpic_tpu.load(patched).np_pixels()

    s = heif.parse_structure(patched)
    ypic, sps, _ = heif._decode_item_yuv(patched, s, s["primary"])
    nclx = dict(primaries=1, transfer=1, matrix=1, full_range=False)
    want = heif._yuv_pic_to_rgba(ypic, sps, 48, 32, nclx)
    np.testing.assert_array_equal(got, want)

    # and it must differ from the naive full-range-601 interpretation
    naive = ffpic_tpu.load(data).np_pixels()
    assert np.abs(got[..., :3].astype(int)
                  - naive[..., :3].astype(int)).max() > 4


def test_heif_cra_item_decodes():
    # wild iPhone HEICs carry CRA (nal 21) slices, not IDR: rebuild a
    # container whose hvc1 item is the same slice rewritten as CRA
    import struct
    from ffpic_tpu.formats import heif_enc, hevc
    from ffpic_tpu.coding.hevc_enc import (EncPolicy, make_nalu,
                                           write_ue, write_se)
    from ffpic_tpu.coding.hevc_slice import parse_slice_header
    from ffpic_tpu.utils.bitstream import BitReader, BitWriter

    _, rgba = _pic(64, 64, seed=11)
    y, u, v = heif_enc.rgb_to_yuv420(rgba)
    y, u, v, _, _ = heif_enc._pad_planes(y, u, v)
    policy = EncPolicy(seed=0, split_prob=0.35, tt_split_prob=0.25,
                       nxn_prob=0.3)
    idr, sps_r, pps_r = heif_enc._encode_tile((y, u, v), 22, policy)
    sps = hevc.parse_sps(make_nalu(33, sps_r))
    pps = hevc.parse_pps(make_nalu(34, pps_r))

    rbsp = hevc.unescape(idr)
    r = BitReader(rbsp)
    r.skip_bits(16)
    hdr = parse_slice_header(r, 19, sps, pps)
    payload = rbsp[hdr.data_bit_offset // 8:]
    w = BitWriter()
    w.write_bit(1)                                   # first_slice
    w.write_bit(0)                                   # no_output_of_prior
    write_ue(w, 0)                                   # pps id
    write_ue(w, 2)                                   # slice_type I
    w.write_bits(0, sps.log2_max_pic_order_cnt)      # poc lsb
    w.write_bit(0)                                   # inline rps
    write_ue(w, 0)
    write_ue(w, 0)
    write_se(w, hdr.qp - pps.init_qp)                # slice_qp_delta
    w.write_bit(1)
    w.align_byte(0)
    cra = make_nalu(21, w.getvalue() + payload)

    def container(nalu):
        items = [(1, b"hvc1", struct.pack(">I", len(nalu)) + nalu, [
            (heif_enc._box("hvcC", heif_enc._hvcc(sps_r, pps_r)), True),
            (heif_enc._ispe(64, 64), False)])]
        return heif_enc._assemble(items, [], 1)

    got = ffpic_tpu.load(container(cra)).np_pixels()
    want = ffpic_tpu.load(container(idr)).np_pixels()
    np.testing.assert_array_equal(got, want)


def test_heif_exif_item_exposed():
    import struct
    from ffpic_tpu.formats import heif_enc, heif
    from test_containers import _exif_app1
    _, rgba = _pic(48, 32, seed=12)
    y, u, v = heif_enc.rgb_to_yuv420(rgba)
    y, u, v, _, _ = heif_enc._pad_planes(y, u, v)
    from ffpic_tpu.coding.hevc_enc import EncPolicy
    pol = EncPolicy(seed=0, split_prob=0.35, tt_split_prob=0.25,
                    nxn_prob=0.3)
    idr, sps_r, pps_r = heif_enc._encode_tile((y, u, v), 24, pol)
    exif_payload = _exif_app1(8)[4:]          # strip marker+len -> Exif\0\0+TIFF
    items = [
        (1, b"hvc1", struct.pack(">I", len(idr)) + idr, [
            (heif_enc._box("hvcC", heif_enc._hvcc(sps_r, pps_r)), True),
            (heif_enc._ispe(48, 32), False)]),
        (2, b"Exif", struct.pack(">I", 0) + exif_payload, []),
    ]
    data = heif_enc._assemble(items, [("cdsc", 2, [1])], 1)
    pic = ffpic_tpu.load(data)
    assert pic.meta["exif"]["orientation"] == 8
    assert pic.meta["exif"]["make"] == "ffpictest"
    assert pic.exif_transpose().np_pixels().shape[:2] == (48, 32)


def test_native_color_matches_numpy():
    """The C YUV->RGBA converter (host_hevc.c ffpic_yuv_to_rgba) must be
    bit-identical to the numpy float32 path for every color mode, bit
    depth and chroma format."""
    import os
    from ffpic_tpu import native
    from ffpic_tpu.formats import heif
    from ffpic_tpu.formats.hevc_recon import Picture

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    class FakeSPS:
        def __init__(s, w, h, bd, mono):
            s.width = w
            s.height = h
            s.bit_depth_luma = bd
            s.chroma_format = 0 if mono else 1
            s.pic_width_cropped = w
            s.pic_height_cropped = h
            s.ctb_log2 = 5

    rng = np.random.default_rng(3)
    modes = ("bt601", "reference",
             {"matrix": 1, "full_range": False},
             {"matrix": 9, "full_range": True},
             {"matrix": 5, "full_range": False})
    for bd in (8, 10):
        for mono in (False, True):
            for mode in modes:
                sps = FakeSPS(77, 53, bd, mono)
                pic = Picture(sps)
                mx = (1 << bd) - 1
                for p in pic.planes:
                    p[:] = rng.integers(0, mx + 1, p.shape)
                a = heif._yuv_pic_to_rgba(pic, sps, 77, 53, mode)
                os.environ["FFPIC_NO_NATIVE"] = "1"
                try:
                    b = heif._yuv_pic_to_rgba(pic, sps, 77, 53, mode)
                finally:
                    del os.environ["FFPIC_NO_NATIVE"]
                np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("kw,enc_kw", [
    (dict(), dict(n_slices=3)),
    (dict(tiles=(2, 2)), dict()),
    (dict(wpp=True), dict()),
    (dict(dependent_slices=True), dict(dependent_splits=2)),
])
def test_heif_multislice_tiles_wpp_items(kw, enc_kw):
    """HEIC items whose hvc1 stream uses multi-slice pictures, tiles,
    WPP or dependent slice segments (the wild non-Apple-encoder
    shapes) decode end-to-end through the container path."""
    import struct
    from ffpic_tpu.coding.hevc_enc import (EncPolicy, SliceEncoder,
                                           write_pps)
    from ffpic_tpu.formats import heif_enc
    import ffpic_tpu

    W = H = 128
    _, rgba = _pic(W, H, seed=21)
    y, u, v = heif_enc.rgb_to_yuv420(rgba)
    pol = EncPolicy(seed=3, split_prob=0.4, tt_split_prob=0.3,
                    nxn_prob=0.2)
    enc = SliceEncoder(dict(width=W, height=H, ctb_log2=5), kw, 28,
                       (y.astype(np.int32), u.astype(np.int32),
                        v.astype(np.int32)), pol)
    nalus = enc.encode_picture(**enc_kw)
    payload = b"".join(struct.pack(">I", len(n)) + n for n in nalus)
    items = [(1, b"hvc1", payload, [
        (heif_enc._box("hvcC", heif_enc._hvcc(enc.sps_rbsp,
                                              enc.pps_rbsp)), True),
        (heif_enc._ispe(W, H), False)])]
    data = heif_enc._assemble(items, [], 1)
    pic = ffpic_tpu.load(data)
    px = pic.np_pixels()
    assert px.shape == (H, W, 4)
    # the container decode must equal the encoder recon through the
    # same color transform
    from ffpic_tpu.formats import heif as heif_mod
    want = heif_mod._yuv_pic_to_rgba(enc.pic, enc.sps, W, H, "bt601")
    np.testing.assert_array_equal(px, want)
