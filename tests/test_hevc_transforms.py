"""HEVC transform/quant golden tests: generated DCT matrices vs the
spec table embedded in the reference (coding/hevc.c:3826-3859),
dequant/inverse-transform properties, encoder round-trips."""

import re

import numpy as np
import pytest

from ffpic_tpu.coding import hevc_consts as hc

REF_HEVC_C = "/root/reference/coding/hevc.c"


def _ref_matrix_32():
    """Parse transMatrixCol out of the reference source text."""
    text = open(REF_HEVC_C).read()
    m = re.search(r"transMatrixCol\[32\]\[32\]\s*=\s*\{(.*?)\};", text,
                  re.S)
    if not m:
        pytest.skip("reference source unavailable")
    nums = [int(x) for x in re.findall(r"-?\d+", m.group(1))]
    assert len(nums) == 1024
    return np.array(nums, dtype=np.int32).reshape(32, 32)


def _ref_dst4():
    text = open(REF_HEVC_C).read()
    m = re.search(r"transMatrix\[4\]\[4\]\s*=\s*\{(.*?)\};", text, re.S)
    nums = [int(x) for x in re.findall(r"-?\d+", m.group(1))]
    return np.array(nums, dtype=np.int32).reshape(4, 4)


def test_dct_matrices_match_spec_table():
    ref32 = _ref_matrix_32()
    assert np.array_equal(hc.dct_matrix(32), ref32)
    for n in (4, 8, 16):
        step = 32 // n
        assert np.array_equal(hc.dct_matrix(n),
                              ref32[::step, :n]), f"N={n}"


def test_dst4_matches_spec_table():
    assert np.array_equal(hc.DST4, _ref_dst4())


def test_dct_matrix_orthogonality():
    # rows are near-orthogonal with norm ~64*sqrt(N)
    for n in (4, 8, 16, 32):
        m = hc.dct_matrix(n).astype(np.int64)
        g = m @ m.T
        diag = np.diag(g).astype(float)
        off = g - np.diag(np.diag(g))
        assert np.all(np.abs(diag - diag.mean()) / diag.mean() < 0.02)
        assert np.max(np.abs(off)) < 0.03 * diag.mean()


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("qp", [0, 10, 22, 30, 37, 51])
def test_transform_roundtrip(n, qp):
    """encoder forward+quant -> dequant+inverse reproduces residual
    within the quantization step (sanity; exactness is covered by the
    stream-level differential once the slice decoder lands).

    Own seeded generator, NOT the session-scoped rng fixture: this is
    a numeric-tolerance test and must not change inputs whenever an
    unrelated earlier test starts consuming the shared stream."""
    rng = np.random.default_rng(1000 * n + qp)
    res = rng.integers(-100, 100, (n, n)).astype(np.int32)
    dst = (n == 4)
    coef = hc.forward_transform(res, dst=dst)
    lv = hc.quantize(coef, qp)
    d = hc.dequant(lv, qp)
    out = hc.inverse_transform(d, dst=dst)
    step = (hc.LEVEL_SCALE[qp % 6] << (qp // 6)) / 16.0
    tol = max(3.0, step * 0.75)   # 2 transform roundings + quant
    assert np.max(np.abs(out - res)) <= tol, (
        f"n={n} qp={qp} maxerr={np.max(np.abs(out - res))} tol={tol}")


def test_dequant_zero_qp_identityish():
    # qp=4 has levelScale 64 -> dequant of quantized DC-only block exact
    lv = np.zeros((4, 4), np.int32)
    lv[0, 0] = 7
    d = hc.dequant(lv, 4)
    # (7 * 16 * 64) << 0 = 7168; bdShift = 8+2-5 = 5 -> +16 >> 5 = 224
    assert d[0, 0] == 224
    assert np.all(d[1:, :] == 0)


def test_scan_orders_match_reference_shape():
    # diagonal 4x4 must start (0,0),(0,1),(1,0),(0,2) in (x,y)
    d = hc.scan_order(2, 0)
    assert d[:4].tolist() == [[0, 0], [0, 1], [1, 0], [0, 2]]
    for idx in (0, 1, 2):
        for log2 in (1, 2, 3):
            s = hc.scan_order(log2, idx)
            n = 1 << log2
            assert sorted(map(tuple, s.tolist())) == sorted(
                (x, y) for x in range(n) for y in range(n))


def test_chroma_qp_table():
    assert hc.chroma_qp(29) == 29
    assert hc.chroma_qp(30) == 29
    assert hc.chroma_qp(43) == 37
    assert hc.chroma_qp(44) == 38
    assert hc.chroma_qp(51) == 45
