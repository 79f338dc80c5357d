"""Structural invariants for the machine-extracted AV1 motion-
compensation constant tables (tools/extract_av1_mc_tables.py).

These are normative spec constants (subpel filters 7.11.3.4, warped
filters 7.11.3.5, OBMC masks 7.11.3.10, wedge tables 7.11.3.11,
interintra weights 7.11.3.13, warp division LUT 7.11.3.7, motion
field projection Div_Mult 7.9.3); the extractor cross-validates the
bytes against libaom + dav1d, and this test pins the mathematical
structure the spec mandates so a regenerated blob cannot silently
drift.
"""

import numpy as np

from ffpic_tpu.coding.av1_mc_tables import TABLES


def test_subpel_filters():
    f = TABLES["subpel_filters"]
    assert f.shape == (6, 16, 8) and f.dtype == np.int16
    # every phase of every set sums to 128 (7.11.3.4: FILTER_BITS=7)
    assert (f.sum(axis=2) == 128).all()
    # phase 0 is the identity tap
    ident = np.zeros(8, np.int16)
    ident[3] = 128
    assert (f[:, 0] == ident).all()
    # bilinear set has exactly 2 active taps per nonzero phase
    bil = f[3]
    assert all((bil[p] != 0).sum() == 2 for p in range(1, 16))
    # 4-tap sets only use taps 2..5
    assert (f[4:, :, [0, 1, 6, 7]] == 0).all()
    # half-phase symmetry: phase 8 is palindromic
    assert (f[:, 8] == f[:, 8, ::-1]).all()
    # phase complementarity: set[k][p] reversed == set[k][16-p]
    for s in range(6):
        for p in range(1, 16):
            assert (f[s, p][::-1] == f[s, 16 - p]).all()


def test_warped_filters():
    w = TABLES["warped_filters"]
    assert w.shape == (193, 8) and w.dtype == np.int16
    assert (w.sum(axis=1) == 128).all()
    # center row (offset 0 = index 96) is palindromic
    assert (w[96] == w[96, ::-1]).all()
    # first row is the offset -64 two-pixel split
    assert w[0].tolist() == [0, 0, 127, 1, 0, 0, 0, 0]
    # taps bounded per 7.11.3.5
    assert (np.abs(w.astype(int)) <= 192).all()


def test_obmc_masks():
    m = TABLES["obmc_mask"]
    assert m.shape == (5, 32) and m.dtype == np.uint8
    for i, n in enumerate([2, 4, 8, 16, 32]):
        row = m[i, :n]
        assert row[-1] == 64
        assert (np.diff(row.astype(int)) >= 0).all()
        assert (m[i, n:] == 0).all()
    assert m[0, :2].tolist() == [45, 64]


def test_wedge_master_rows():
    r = TABLES["wedge_master_rows"]
    assert r.shape == (3, 64) and r.dtype == np.uint8
    for row in r:
        assert row[0] == 0 and row[-1] == 64
        assert (np.diff(row.astype(int)) >= 0).all()
    # odd/even rows: 28 leading zeros, 28 trailing 64s
    assert (r[:2, :28] == 0).all() and (r[:2, 36:] == 64).all()
    # vertical row: centered 6-tap ramp
    assert (r[2, :29] == 0).all() and (r[2, 35:] == 64).all()
    assert r[2, 29:35].tolist() == [2, 7, 21, 43, 57, 62]


def test_wedge_codebook():
    c = TABLES["wedge_codebook"]
    assert c.shape == (3, 16, 3)
    # directions 0..5, offsets in {2,4,6} (units of w/8, h/8)
    assert (c[:, :, 0] >= 0).all() and (c[:, :, 0] <= 5).all()
    assert np.isin(c[:, :, 1:], [2, 4, 6]).all()
    # all three books share the oblique-centered first four entries
    first4 = [[2, 4, 4], [3, 4, 4], [4, 4, 4], [5, 4, 4]]
    for b in range(3):
        assert c[b, :4].tolist() == first4


def test_dist_weight_tables():
    ql = TABLES["quant_dist_lookup"]
    qw = TABLES["quant_dist_weight"]
    assert ql.tolist() == [[9, 7], [11, 5], [12, 4], [13, 3]]
    assert qw.tolist() == [[2, 3], [2, 5], [2, 7], [1, 31]]
    # forward/backward weights sum to 16 (7.11.3.15)
    assert (ql.sum(axis=1) == 16).all()


def test_div_tables():
    dm = TABLES["div_mult"]
    assert dm.tolist() == [0] + [16384 // d for d in range(1, 32)]
    dl = TABLES["div_lut"]
    assert dl.shape == (257,)
    assert dl[0] == 16384 and dl[-1] == 8192
    assert (np.diff(dl.astype(int)) <= 0).all()
    # exact closed form over the normalized mantissa range [1, 2):
    # Div_Lut[i] = round(2^22 / (256 + i)) (DIV_LUT_PREC_BITS=14,
    # DIV_LUT_BITS=8) — holds for every extracted entry
    ref = np.array([((1 << 22) + ((256 + i) >> 1)) // (256 + i)
                    for i in range(257)])
    assert (ref == dl).all()


def test_ii_weights():
    w = TABLES["ii_weights_1d"]
    assert w.shape == (32,)
    assert w[0] == 60 and w[-1] == 1
    assert (np.diff(w.astype(int)) <= 0).all()
