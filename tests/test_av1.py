"""AV1 intra decoder differential tests vs dav1d.

Streams are encoded in-test with the system libaom (via Pillow's AVIF
writer) and decoded with both our decoder and dav1d (statically linked
into Pillow's libavif; see tools/dav1d_oracle.py).  Recon is compared
PLANE-EXACT with dav1d's in-loop filters masked off (inloop_filters=0)
until the deblock/CDEF/LR stages land.

The C reference (junka/ffpic) decodes no AV1 pixels at all
(format/avif.c:382-405 parses the container and stops), so every test
here is beyond-reference coverage.
"""

import numpy as np
import pytest

from tools.dav1d_oracle import decode_obus, avif_item_obus
from ffpic_tpu.formats.av1_recon import decode_frame


def _encode(img, tmp_path, name, **kw):
    from PIL import Image
    fn = tmp_path / name
    Image.fromarray(img).save(fn, **kw)
    return avif_item_obus(fn.read_bytes())


def _gradient(w, h, rng, noise=20):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    g = (x[None, :] + y[:, None]) / 2
    img = np.stack([g, g[::-1], np.abs(g - 128) * 2], -1)
    img = img.astype(np.uint8)
    img += rng.integers(0, noise, img.shape, dtype=np.uint8)
    return img


def _assert_exact(obus):
    ref, meta = decode_obus(obus, inloop_filters=0)
    ours, m2 = decode_frame(obus, apply_filters=False)
    assert len(ours) == len(ref)
    for i, (a, b) in enumerate(zip(ours, ref)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"
    return m2


@pytest.mark.parametrize("q,speed", [(30, 6), (60, 6), (85, 4)])
def test_av1_recon_64_420(tmp_path, q, speed):
    rng = np.random.default_rng(q)
    img = _gradient(64, 64, rng)
    obus = _encode(img, tmp_path, f"a{q}.avif", quality=q, speed=speed)
    _assert_exact(obus)


@pytest.mark.parametrize("sub", ["4:2:0", "4:4:4", "4:2:2", "4:0:0"])
def test_av1_recon_subsampling(tmp_path, sub):
    rng = np.random.default_rng(7)
    img = _gradient(128, 128, rng)
    obus = _encode(img, tmp_path, "s.avif", quality=70, speed=6,
                   subsampling=sub)
    _assert_exact(obus)


def test_av1_recon_odd_size(tmp_path):
    rng = np.random.default_rng(11)
    img = _gradient(200, 136, rng)
    obus = _encode(img, tmp_path, "o.avif", quality=55, speed=6)
    meta = _assert_exact(obus)
    assert meta["width"] == 200 and meta["height"] == 136


def test_av1_recon_multi_tile(tmp_path):
    rng = np.random.default_rng(13)
    img = _gradient(256, 256, rng)
    obus = _encode(img, tmp_path, "t.avif", quality=60, speed=6,
                   tile_rows=1, tile_cols=1)
    _assert_exact(obus)


@pytest.mark.parametrize("q", [30, 60, 85])
def test_av1_deblock(tmp_path, q):
    """Recon + deblocking vs dav1d with inloop_filters=1 (deblock
    only; CDEF/LR masked off)."""
    rng = np.random.default_rng(q + 1)
    img = _gradient(128, 128, rng)
    obus = _encode(img, tmp_path, f"d{q}.avif", quality=q, speed=6)
    ref, _ = decode_obus(obus, inloop_filters=1)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=1)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


@pytest.mark.parametrize("q,sub", [(20, "4:2:0"), (40, "4:2:0"),
                                   (60, "4:4:4"), (40, "4:2:2"),
                                   (30, "4:0:0")])
def test_av1_cdef(tmp_path, q, sub):
    """Recon + deblock + CDEF vs dav1d inloop_filters=3 (LR masked)."""
    rng = np.random.default_rng(q * 3)
    img = _gradient(128, 128, rng)
    obus = _encode(img, tmp_path, f"c{q}.avif", quality=q, speed=6,
                   subsampling=sub)
    ref, _ = decode_obus(obus, inloop_filters=3)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=3)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


def test_av1_cdef_odd_size(tmp_path):
    """CDEF on a non-square, non-SB-aligned frame (exercises the
    partial 64x64 unit and frame-edge CDEF_VERY_LARGE padding)."""
    rng = np.random.default_rng(99)
    img = _gradient(200, 136, rng)
    obus = _encode(img, tmp_path, "co.avif", quality=40, speed=6)
    ref, _ = decode_obus(obus, inloop_filters=3)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=3)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


def test_av1_cfl_overhang(tmp_path):
    """CfL on blocks overhanging the mi grid: the luma AC source must
    read real reconstructed overhang pixels (SB-aligned buffers), not
    clamped plane edges (regression: 200x136 4:2:0 q40)."""
    rng = np.random.default_rng(240)
    img = _gradient(200, 136, rng)
    obus = _encode(img, tmp_path, "cf.avif", quality=40, speed=6)
    _assert_exact(obus)


def test_av1_recon_no_cdf_update(tmp_path):
    """disable_cdf_update streams: every symbol reads default CDFs, so
    any table/ctx-selection bug fails immediately (no adaptation to
    mask it)."""
    rng = np.random.default_rng(17)
    img = _gradient(96, 96, rng)
    obus = _encode(img, tmp_path, "n.avif", quality=80, speed=5,
                   advanced={"cdf-update-mode": "0"})
    _assert_exact(obus)


def test_av1_444_overhang_ctx_clip(tmp_path):
    """Coefficient-level ctx reads/writes must be clipped to the
    frame's mi extent for TBs overhanging the right/bottom edge: a
    16x32 block in an 8-px partial SB column adapts txb_skip/dc_sign
    rows through the overhang cells otherwise, desyncing the adapted
    CDFs hundreds of symbols later (regression: 4:4:4 200x136 q20)."""
    rng = np.random.default_rng(20336)
    img = _gradient(200, 136, rng)
    obus = _encode(img, tmp_path, "ov.avif", quality=20, speed=6,
                   subsampling="4:4:4")
    _assert_exact(obus)


def test_av1_dequant_area_scale(tmp_path):
    """Dequant scale is keyed on full tx AREA (spec dqDenom /
    av1_get_tx_scale), not sqr-up size: an 8x32 TB (256 pels) shifts
    0 where sqr-up-32 wrongly shifted 1 (regression: speed-1 q60)."""
    rng = np.random.default_rng(1)
    x = np.linspace(0, 255, 128)
    g = (x[None, :] + x[:, None]) / 2
    img = np.stack([g, g[::-1], np.abs(g - 128) * 2], -1).astype(np.uint8)
    img += rng.integers(0, 30, img.shape, dtype=np.uint8)
    obus = _encode(img, tmp_path, "dq.avif", quality=60, speed=1)
    _assert_exact(obus)


def _assert_filtered_exact(obus, mask=7):
    ref, _ = decode_obus(obus, inloop_filters=mask)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=mask)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


def test_av1_lr_wiener(tmp_path):
    """Loop restoration, Wiener-only luma unit (spec 7.17.4), plus
    the inverse_recenter parity this stream pins (libaom
    inv_recenter_nonneg: even v above the ref — the opposite parity
    decodes plausible-but-wrong taps with identical bit consumption,
    invisible to every entropy-sync test)."""
    rng = np.random.default_rng(7)
    img = _gradient(200, 136, rng, noise=30)
    obus = _encode(img, tmp_path, "lw.avif", quality=40, speed=2)
    _assert_filtered_exact(obus)


def test_av1_lr_sgr_multiunit(tmp_path):
    """Self-guided restoration over a 2x2 unit grid with multiple
    64-row stripes (stripe-boundary rows read the deblocked pre-CDEF
    frame per get_source_sample), mixed SGR sets incl. an r0==0 set.
    Also pins the deblock vertical pass with loop_filter_level[0]==0
    but ref_deltas raising edge levels (no per-pass gate, 7.14.4)."""
    rng = np.random.default_rng(1)
    img = _gradient(512, 512, rng, noise=40)
    obus = _encode(img, tmp_path, "ls.avif", quality=50, speed=2)
    _assert_filtered_exact(obus)


def test_av1_lr_444_mixed(tmp_path):
    """4:4:4 frame mixing Wiener luma units with SGR chroma units
    (incl. r1==0 sets 14/15) across a multi-unit grid."""
    rng = np.random.default_rng(5)
    img = _gradient(512, 512, rng, noise=50)
    obus = _encode(img, tmp_path, "l4.avif", quality=40, speed=2,
                   subsampling="4:4:4")
    _assert_filtered_exact(obus)


def test_av1_lr_monochrome(tmp_path):
    """4:0:0 with mixed Wiener/SGR units on the single plane."""
    rng = np.random.default_rng(7)
    img = _gradient(512, 512, rng, noise=50)
    obus = _encode(img, tmp_path, "lm.avif", quality=40, speed=2,
                   subsampling="4:0:0")
    _assert_filtered_exact(obus)


def test_av1_lr_syntax_and_filter_type(tmp_path):
    """speed-2 streams enable loop restoration (per-SB read_lr units
    must be consumed to stay in entropy sync) and 4xN/Nx4 partition
    pairs (get_filter_type must look at the CHROMA block's neighbors
    via the propagated uv-mode array).  Recon + deblock + CDEF exact;
    the LR filter itself is covered separately."""
    rng = np.random.default_rng(1)
    x = np.linspace(0, 255, 128)
    g = (x[None, :] + x[:, None]) / 2
    img = np.stack([g, g[::-1], np.abs(g - 128) * 2], -1).astype(np.uint8)
    img += rng.integers(0, 30, img.shape, dtype=np.uint8)
    obus = _encode(img, tmp_path, "lr.avif", quality=60, speed=2)
    _assert_exact(obus)
    ref, _ = decode_obus(obus, inloop_filters=3)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=3)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


def test_av1_sb128(tmp_path):
    """128x128 superblocks (speed-0 encodes set use_128x128_superblock):
    read_cdef must consume exactly ONE cdef_idx literal per coded block
    anchored at its 64x64-aligned corner, propagated over every unit the
    block covers — per-unit reads over-consume cdef_bits and desync on
    the first unpartitioned >64px block.  Full in-loop filter chain
    (deblock + CDEF + LR) vs dav1d."""
    rng = np.random.default_rng(1)
    x = np.linspace(0, 255, 256)
    g = (x[None, :] + x[:, None]) / 2
    img = np.stack([g, g[::-1], np.abs(g - 128) * 2], -1).astype(np.uint8)
    img += rng.integers(0, 20, img.shape, dtype=np.uint8)
    obus = _encode(img, tmp_path, "sb128.avif", quality=60, speed=0)
    from ffpic_tpu.coding import av1_headers as H
    for obu in H.parse_obus(obus):
        if obu["type"] == 1:
            assert H.parse_sequence_header(
                obu["payload"]).use_128x128_superblock
            break
    ref, _ = decode_obus(obus, inloop_filters=7)
    ours, _ = decode_frame(obus, apply_filters=True, filter_stages=7)
    for i, (a, b) in enumerate(zip(ours, ref)):
        bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
        assert bad == 0, f"plane {i}: {bad}/{a.size} mismatch"


def test_av1_native_vs_oracle(tmp_path, monkeypatch):
    """The C fast paths (host_av1.c coefficient decode + recon
    executor) must be bit-identical to the pure-Python oracle."""
    img = _gradient(160, 96, np.random.default_rng(3))
    obus = _encode(img, tmp_path, "n.avif", quality=55, speed=4)
    nat, _ = decode_frame(obus, apply_filters=True)
    monkeypatch.setenv("FFPIC_AV1_NO_NATIVE", "1")
    orc, _ = decode_frame(obus, apply_filters=True)
    for a, b in zip(nat, orc):
        assert (a == b).all()


def _leb128(v):
    out = b""
    while True:
        byte = v & 0x7F
        v >>= 7
        out += bytes([byte | (0x80 if v else 0)])
        if not v:
            return out


def _obu(t, payload):
    return bytes([(t << 3) | 2]) + _leb128(len(payload)) + payload


def test_av1_split_obu_forms(tmp_path):
    """OBU_FRAME_HEADER + OBU_TILE_GROUP streams (spec 5.10 allows
    both the combined OBU_FRAME form and the split form; some
    encoders emit the latter), including MULTIPLE tile-group OBUs
    with tile_start_and_end_present ranges."""
    from ffpic_tpu.coding import av1_headers as H
    rng = np.random.default_rng(13)
    img = _gradient(256, 256, rng)
    obus = _encode(img, tmp_path, "s.avif", quality=60, speed=6,
                   tile_rows=1, tile_cols=1)
    seq = None
    split = b""
    multi = b""
    for obu in H.parse_obus(obus):
        if obu["type"] == H.OBU_SEQUENCE_HEADER:
            seq = H.parse_sequence_header(obu["payload"])
            split += _obu(1, obu["payload"])
            multi += _obu(1, obu["payload"])
        elif obu["type"] == H.OBU_FRAME:
            payload = obu["payload"]
            fh, bitpos = H.parse_frame_header(payload, seq)
            nb = (bitpos + 7) >> 3
            hdr, tg = payload[:nb], payload[nb:]
            split += _obu(H.OBU_FRAME_HEADER, hdr)
            split += _obu(H.OBU_TILE_GROUP, tg)
            # split the tile group into one OBU per tile with
            # explicit [tg_start, tg_end] ranges
            ntiles = fh.tile_cols * fh.tile_rows
            assert ntiles == 4
            bits = fh.tile_cols_log2 + fh.tile_rows_log2
            pos = 1     # original tg header: flag bit 0 + alignment
            tiles = []
            for tn in range(ntiles):
                if tn == ntiles - 1:
                    tiles.append(tg[pos:])
                else:
                    size = int.from_bytes(
                        tg[pos:pos + fh.tile_size_bytes],
                        "little") + 1
                    pos += fh.tile_size_bytes
                    tiles.append(tg[pos:pos + size])
                    pos += size
            multi += _obu(H.OBU_FRAME_HEADER, hdr)
            assert bits == 2      # 2x2 tiles
            for tn, tile in enumerate(tiles):
                # flag=1 (bit 7), tg_start (bits 6-5), tg_end (4-3)
                b0 = 0x80 | (tn << 5) | (tn << 3)
                multi += _obu(H.OBU_TILE_GROUP, bytes([b0]) + tile)
    ref, _ = decode_obus(obus, inloop_filters=7)
    for name, stream in (("split", split), ("multi-tg", multi)):
        ours, _ = decode_frame(stream, apply_filters=True)
        for i, (a, b) in enumerate(zip(ours, ref)):
            bad = int((a.astype(np.int64) != b.astype(np.int64)).sum())
            assert bad == 0, f"{name} plane {i}: {bad} mismatch"


def test_av1_sb_native_vs_block_native(tmp_path, monkeypatch):
    """The whole-superblock C driver (av1_sb_parse: fused partition
    walk + mode-info + grid records + residual) must be bit-identical
    to the per-block C path AND to the pure-Python oracle, including
    the recorded mode grids the loop filters consume."""
    from ffpic_tpu.coding.av1_tile import FrameState, TileDecoder
    from ffpic_tpu.coding import av1_headers as H

    img = _gradient(160, 96, np.random.default_rng(11))
    obus = _encode(img, tmp_path, "sbn.avif", quality=45, speed=3)

    def grids(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        planes, _ = decode_frame(obus, apply_filters=True)
        # re-parse to capture the FrameState grids
        seq = fh = None
        for obu in H.parse_obus(obus):
            if obu["type"] == H.OBU_SEQUENCE_HEADER:
                seq = H.parse_sequence_header(obu["payload"])
            elif obu["type"] == H.OBU_FRAME:
                fh, bitpos = H.parse_frame_header(obu["payload"], seq)
                fs = FrameState(seq, fh)
                from ffpic_tpu.formats.av1_recon import \
                    _decode_tile_group
                _decode_tile_group(fs,
                                   obu["payload"][(bitpos + 7) >> 3:])
                break
        for k in env:
            monkeypatch.delenv(k)
        return planes, fs

    p_sb, fs_sb = grids({})
    p_blk, fs_blk = grids({"FFPIC_AV1_BLOCK_NATIVE": "1"})
    p_py, fs_py = grids({"FFPIC_AV1_NO_NATIVE": "1"})
    for a, b in zip(p_sb, p_blk):
        assert (a == b).all()
    for a, b in zip(p_sb, p_py):
        assert (a == b).all()
    for name in ("bsize", "y_mode", "uv_mode", "skip", "seg",
                 "qindex_mi", "b_col0", "b_row0", "delta_lf"):
        ga = getattr(fs_sb, name)
        gb = getattr(fs_blk, name)
        assert (ga == gb).all(), name
        gc = getattr(fs_py, name)
        assert (ga == gc).all(), name
    recs_sb = list(fs_sb.tb_records())
    recs_blk = list(fs_blk.tb_records())
    assert len(recs_sb) == len(recs_blk)
    for ta, tb_ in zip(recs_sb, recs_blk):
        assert ta[:7] == tb_[:7]
        assert (ta[7] == tb_[7]).all()


def test_av1_deblock_native_vs_numpy(tmp_path, monkeypatch):
    """C deblock (host_av1.c av1_deblock_pass) vs the vectorized
    numpy path: bit-identical planes on a filtered stream."""
    img = _gradient(160, 96, np.random.default_rng(13))
    obus = _encode(img, tmp_path, "dbk.avif", quality=35, speed=5)
    nat, _ = decode_frame(obus, apply_filters=True, filter_stages=1)
    monkeypatch.setenv("FFPIC_AV1_HOST_DEBLOCK", "1")
    ref, _ = decode_frame(obus, apply_filters=True, filter_stages=1)
    for a, b in zip(nat, ref):
        assert (a == b).all()


# ---------------------------------------------------------------------------
# Palette mode (screen-content intra tool; spec 5.11.45/46, 5.11.49/50)
# ---------------------------------------------------------------------------

def _screen_img(rng, w=128, h=96, ncols=6):
    img = np.zeros((h, w, 3), np.uint8)
    cols = rng.integers(0, 256, (ncols, 3))
    sw = w // ncols
    for i in range(ncols):
        img[:, i * sw:(i + 1) * sw] = cols[i]
    img[h // 4:h // 3, w // 12:w - w // 4] = [255, 255, 255]
    img[-4:, :] = [0, 0, 0]
    return img


def test_av1_palette_mode_dav1d_exact(tmp_path):
    """Palette-coded blocks (aom auto-enables screen-content tools on
    synthetic/flat content): bit-exact vs dav1d across qualities and
    speeds, full in-loop filters.  Also regression-pins the palette
    color-index CDF tables — the y/uv pair was swapped in the rodata
    extraction and only palette streams expose them."""
    rng = np.random.default_rng(1)
    img = _screen_img(rng)
    hit_palette = False
    for q, sp in ((30, 2), (60, 6), (90, 4)):
        obus = _encode(img, tmp_path, f"pal{q}{sp}.avif",
                       quality=q, speed=sp)
        fh = None
        from ffpic_tpu.coding import av1_headers as Hh
        for obu in Hh.parse_obus(obus):
            if obu["type"] == Hh.OBU_SEQUENCE_HEADER:
                seq = Hh.parse_sequence_header(obu["payload"])
            elif obu["type"] in (Hh.OBU_FRAME, Hh.OBU_FRAME_HEADER):
                fh, _ = Hh.parse_frame_header(obu["payload"], seq)
                break
        assert fh is not None and fh.allow_screen_content_tools
        planes, hdr = decode_frame(obus, apply_filters=True)
        want, meta = decode_obus(obus)
        for i, (p, w) in enumerate(zip(planes, want)):
            np.testing.assert_array_equal(
                np.asarray(p), np.asarray(w),
                err_msg=f"q={q} sp={sp} plane {i}")
        hit_palette = True
    assert hit_palette


def test_av1_palette_uv_and_cache_dav1d_exact(tmp_path):
    """Wider screen-content sweep: neighbor palette-cache reuse
    (left + above within the SB row), uv palettes, text-like
    content."""
    rng = np.random.default_rng(9)
    big = np.full((240, 320, 3), 255, np.uint8)
    for _ in range(40):
        x0 = int(rng.integers(0, 300))
        y0 = int(rng.integers(0, 220))
        big[y0:y0 + int(rng.integers(2, 14)),
            x0:x0 + int(rng.integers(4, 18))] = rng.integers(0, 256, 3)
    for q, sp in ((50, 5), (75, 3)):
        obus = _encode(big, tmp_path, f"txt{q}{sp}.avif",
                       quality=q, speed=sp)
        planes, hdr = decode_frame(obus, apply_filters=True)
        want, meta = decode_obus(obus)
        for i, (p, w) in enumerate(zip(planes, want)):
            np.testing.assert_array_equal(
                np.asarray(p), np.asarray(w),
                err_msg=f"q={q} sp={sp} plane {i}")


def test_avif_screen_content_end_to_end():
    """AVIF container path on a palette stream: RGBA within the
    documented 3-LSB chroma-upsample tolerance of libavif."""
    import io
    from PIL import Image
    import ffpic_tpu

    rng = np.random.default_rng(4)
    img = _screen_img(rng, w=96, h=64, ncols=4)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "AVIF", quality=60, speed=6)
    data = b.getvalue()
    pic = ffpic_tpu.load(data)
    want = np.array(Image.open(io.BytesIO(data)).convert("RGBA"))
    got = pic.np_pixels()
    assert got.shape == want.shape
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 3


def test_av1_unpartitioned_128_block_txb_skip_ctx(tmp_path):
    """Unpartitioned 128x128 blocks with coded TX_64X64 residual:
    the all_zero (txb_skip) ctx compares the FULL block's plane dims
    against the tx dims (spec get_txb_skip_ctx) — a 128-wide block is
    never 'equal' to its 64px tx even though the residual walk's
    64x64 chunk is, and chroma compares block area > tx area
    (off 10 vs 7).  Regression: 256x192 flat content, q35 speed 0
    (sb128), desynced at the first TX_64 coefficient block on all
    three parse paths identically."""
    img = np.zeros((192, 256, 3), np.uint8)
    img[:, :128] = (200, 30, 90)
    img[64:, 85:] = (10, 220, 180)
    rng = np.random.default_rng(0)
    img += rng.integers(0, 8, img.shape, dtype=np.uint8)
    obus = _encode(img, tmp_path, "u128.avif", quality=35, speed=0)
    planes, hdr = decode_frame(obus, apply_filters=True)
    want, meta = decode_obus(obus)
    for i, (p, w) in enumerate(zip(planes, want)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(w),
                                      err_msg=f"plane {i}")


def test_av1_palette_three_path_differential(tmp_path, monkeypatch):
    """Palette mode decodes natively on all three parse paths
    (whole-SB C via av1_sb_parse, per-block C via av1_block_mode,
    pure-Python oracle) with identical pixels, palette-size grids and
    TB records — and bit-exact vs dav1d.  Guards the C port of
    get_palette_cache / palette colors / the index-map wavefront
    (host_av1.c pal_*) against the Python single source of truth."""
    from ffpic_tpu.coding.av1_tile import FrameState
    from ffpic_tpu.coding import av1_headers as H

    rng = np.random.default_rng(7)
    img = _screen_img(rng, w=160, h=128, ncols=7)
    obus = _encode(img, tmp_path, "pal3.avif", quality=45, speed=4)

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        planes, _ = decode_frame(obus, apply_filters=True)
        seq = fs = None
        for obu in H.parse_obus(obus):
            if obu["type"] == H.OBU_SEQUENCE_HEADER:
                seq = H.parse_sequence_header(obu["payload"])
            elif obu["type"] == H.OBU_FRAME:
                fh, bitpos = H.parse_frame_header(obu["payload"], seq)
                fs = FrameState(seq, fh)
                from ffpic_tpu.formats.av1_recon import \
                    _decode_tile_group
                _decode_tile_group(fs,
                                   obu["payload"][(bitpos + 7) >> 3:])
                break
        for k in env:
            monkeypatch.delenv(k)
        return planes, fs

    p_sb, fs_sb = run({})
    p_blk, fs_blk = run({"FFPIC_AV1_BLOCK_NATIVE": "1"})
    p_py, fs_py = run({"FFPIC_AV1_NO_NATIVE": "1"})
    # the stream must actually contain palette blocks on the C paths
    assert fs_sb.pal_count > 0
    assert fs_blk.pal_count > 0
    assert fs_py.pal_colors
    for a, b in zip(p_sb, p_blk):
        assert (np.asarray(a) == np.asarray(b)).all()
    for a, b in zip(p_sb, p_py):
        assert (np.asarray(a) == np.asarray(b)).all()
    for name in ("palette_size", "bsize", "y_mode", "uv_mode",
                 "skip", "qindex_mi"):
        ga = getattr(fs_sb, name)
        assert (ga == getattr(fs_blk, name)).all(), name
        assert (ga == getattr(fs_py, name)).all(), name
    recs_sb = list(fs_sb.tb_records())
    recs_blk = list(fs_blk.tb_records())
    recs_py = list(fs_py.tb_records())
    assert len(recs_sb) == len(recs_blk) == len(recs_py)
    for ta, tb_, tc in zip(recs_sb, recs_blk, recs_py):
        assert ta[:7] == tb_[:7] == tc[:7]
        assert (ta[7] == tb_[7]).all() and (ta[7] == tc[7]).all()
    # dav1d oracle
    want, _ = decode_obus(obus)
    for i, (p, w) in enumerate(zip(p_sb, want)):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(w),
                                      err_msg=f"plane {i}")


# ---------------------------------------------------------------------------
# Intrabc (intra block copy; spec 5.11.21, inter-style var-tx + DV
# prediction).  aom auto-enables allow_intrabc on screen-content
# keyframes >= ~320px, so wild screen AVIFs need it.


def _ibc_obus(tmp_path, w, h, q, sp, sub="4:2:0", seed=5):
    from ffpic_tpu.coding import av1_headers as Hh
    rng = np.random.default_rng(seed)
    img = _screen_img(rng, w=w, h=h, ncols=6)
    from PIL import Image
    fn = tmp_path / f"ibc{w}x{h}q{q}s{sp}.avif"
    Image.fromarray(img).save(fn, quality=q, speed=sp,
                              subsampling=sub)
    obus = avif_item_obus(fn.read_bytes())
    seq = fh = None
    for obu in Hh.parse_obus(obus):
        if obu["type"] == Hh.OBU_SEQUENCE_HEADER:
            seq = Hh.parse_sequence_header(obu["payload"])
        elif obu["type"] in (Hh.OBU_FRAME, Hh.OBU_FRAME_HEADER):
            fh, _ = Hh.parse_frame_header(obu["payload"], seq)
            break
    return obus, fh


def test_av1_intrabc_dav1d_exact(tmp_path):
    """Intrabc streams decode bit-exactly vs dav1d: DV prediction
    (neighbor scan + spec defaults), mv_joint/component symbols,
    inter-style var-tx trees, inter tx-type sets, and the block-copy
    prediction with bilinear half-pel chroma."""
    hit = 0
    for w, h, q, sp in ((320, 256, 60, 6), (512, 512, 30, 3),
                        (400, 304, 30, 0)):
        obus, fh = _ibc_obus(tmp_path, w, h, q, sp)
        if not fh.allow_intrabc:
            continue
        hit += 1
        ours, _ = decode_frame(obus, apply_filters=True)
        want, _ = decode_obus(obus)
        for i, (p, wv) in enumerate(zip(ours, want)):
            np.testing.assert_array_equal(
                np.asarray(p), np.asarray(wv),
                err_msg=f"{w}x{h} q{q} sp{sp} plane {i}")
    assert hit >= 2


def test_av1_intrabc_chroma_subsampling(tmp_path):
    """Half-pel chroma DVs (odd whole-pel luma DV under 4:2:0) and
    the 4:4:4/4:2:2 full-pel paths all match dav1d."""
    hit = 0
    for sub in ("4:2:0", "4:4:4", "4:2:2"):
        obus, fh = _ibc_obus(tmp_path, 320, 256, 30, 6, sub=sub)
        if not fh.allow_intrabc:
            continue
        hit += 1
        ours, _ = decode_frame(obus, apply_filters=True)
        want, _ = decode_obus(obus)
        for i, (p, wv) in enumerate(zip(ours, want)):
            np.testing.assert_array_equal(
                np.asarray(p), np.asarray(wv),
                err_msg=f"{sub} plane {i}")
    assert hit >= 2


def test_avif_intrabc_end_to_end(tmp_path):
    """AVIF container path on an intrabc stream -> RGBA."""
    import ffpic_tpu
    rng = np.random.default_rng(5)
    img = _screen_img(rng, w=320, h=256, ncols=6)
    from PIL import Image
    fn = tmp_path / "e2e.avif"
    Image.fromarray(img).save(fn, quality=60, speed=6)
    pic = ffpic_tpu.load(str(fn))
    got = pic.np_pixels()
    assert got.shape == (256, 320, 3) or got.shape == (256, 320, 4)
    import PIL.Image as I
    want = np.asarray(I.open(fn).convert("RGB"))
    assert int(np.abs(got[..., :3].astype(int)
                      - want.astype(int)).max()) <= 3


def test_av1_lossless_aom_streams_dav1d_exact(tmp_path):
    """CodedLossless (qindex 0, 4x4 WHT) aom streams decode
    bit-exactly.  Regression for the lossless CfL gate: at lossless,
    CfL is only allowed when the block's chroma is a single forced
    4x4 TB (dav1d cfl_allowed) — the uv_mode alphabet is 13 not 14
    for larger blocks, which desynced every lossless-with-chroma
    stream (no lossless stream had ever been in the conformance
    corpus; found by the encoder bring-up cross-oracle campaign)."""
    from PIL import Image
    rng = np.random.default_rng(5)
    for wh, sub in ((32, "4:4:4"), (32, "4:2:0"), (64, "4:2:0"),
                    (48, "4:2:2")):
        img = rng.integers(0, 256, (wh, wh, 3), np.uint8)
        fn = tmp_path / f"l{wh}{sub.replace(':', '')}.avif"
        Image.fromarray(img).save(fn, quality=100, subsampling=sub,
                                  speed=6)
        obus = avif_item_obus(fn.read_bytes())
        ours, _ = decode_frame(obus, apply_filters=True)
        want, _ = decode_obus(obus)
        for i, (a, b) in enumerate(zip(ours, want)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{wh} {sub} plane {i}")


def test_av1_odd_dims_aom_streams(tmp_path):
    """True odd dimensions, full in-loop filters.  Regression for
    the deblock frame-extent clamp: the mi grid is 8px-aligned, so a
    75px-wide frame has a fully-padding mi column whose phantom tx
    edge (x=76) must NOT be filtered — its p1 tap reaches the real
    pixel column 74 (found as a single-pixel dav1d divergence)."""
    from PIL import Image
    rng = np.random.default_rng(6)
    for (w, h) in ((33, 17), (75, 53), (51, 37)):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        for q in (100, 50):
            fn = tmp_path / f"o{w}x{h}q{q}.avif"
            Image.fromarray(img).save(fn, quality=q,
                                      subsampling="4:2:0", speed=6)
            obus = avif_item_obus(fn.read_bytes())
            ours, _ = decode_frame(obus, apply_filters=True)
            want, _ = decode_obus(obus)
            for i, (a, b) in enumerate(zip(ours, want)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{w}x{h} q{q} plane {i}")


def test_av1_intrabc_native_vs_python(tmp_path, monkeypatch):
    """Intrabc on the whole-SB C driver (DV scan/read, var-tx trees,
    inter tx types, K_IBC block-copy recon op) must match the Python
    symbol path exactly: pixels, MV grids, TB records."""
    from ffpic_tpu.coding.av1_tile import FrameState
    from ffpic_tpu.coding import av1_headers as H

    obus, fh = _ibc_obus(tmp_path, 320, 256, 30, 3)
    assert fh.allow_intrabc

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        planes, _ = decode_frame(obus, apply_filters=True)
        seq = fs = None
        for obu in H.parse_obus(obus):
            if obu["type"] == H.OBU_SEQUENCE_HEADER:
                seq = H.parse_sequence_header(obu["payload"])
            elif obu["type"] == H.OBU_FRAME:
                fh2, bitpos = H.parse_frame_header(obu["payload"],
                                                   seq)
                fs = FrameState(seq, fh2)
                from ffpic_tpu.formats.av1_recon import \
                    _decode_tile_group
                _decode_tile_group(fs,
                                   obu["payload"][(bitpos + 7) >> 3:])
                break
        for k in env:
            monkeypatch.delenv(k)
        return planes, fs

    p_nat, fs_nat = run({})
    p_py, fs_py = run({"FFPIC_AV1_NO_NATIVE": "1"})
    assert fs_nat.is_ibc.any() and fs_py.is_ibc.any()
    for a, b in zip(p_nat, p_py):
        assert (np.asarray(a) == np.asarray(b)).all()
    for name in ("is_ibc", "mvs", "bsize", "skip", "inter_tx",
                 "tx_types"):
        assert (getattr(fs_nat, name) == getattr(fs_py, name)).all(), \
            name
    recs_n = list(fs_nat.tb_records())
    recs_p = list(fs_py.tb_records())
    assert len(recs_n) == len(recs_p)
    for ta, tb_ in zip(recs_n, recs_p):
        assert ta[:7] == tb_[:7]
        assert (ta[7] == tb_[7]).all()
