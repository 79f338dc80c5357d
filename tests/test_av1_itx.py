"""AV1 inverse-transform unit tests.

Two layers:
* closed-form float checks — the integer DCT/ADST/identity networks
  in coding/av1_itx.py must approximate the textbook inverse
  transforms (catches structural porting mistakes independently of
  any codec stream);
* native differential sweep — the lane-major C executor
  (native/host_av1_itx.c) must be BIT-exact with the numpy int32
  lane path across every legal (tx_size, tx_type, bit_depth) combo,
  including full-range int32 inputs (wraparound parity: the C uses
  explicit uint32 arithmetic because the build has no -fwrapv).

End-to-end the transforms are further validated bit-exactly against
dav1d YUV output in tests/test_av1.py.  The C reference
(junka/ffpic) has no AV1 decode layer (avif.c:382-405 stub).
"""

import os

import numpy as np
import pytest

from ffpic_tpu.coding import av1_itx as I
from ffpic_tpu.coding.av1_consts import TX_W, TX_H, adjusted_tx_size


def _legal_combos():
    for tx in range(19):
        w, h = TX_W[tx], TX_H[tx]
        for tt in range(16):
            vk, hk = I._TYPE_1D[tt]
            if vk in (1, 2) and h > 16:     # ADST max dim 16
                continue
            if hk in (1, 2) and w > 16:
                continue
            yield tx, tt, w, h


# ---------------------------------------------------------------------------
# closed-form float checks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [4, 8, 16, 32, 64])
def test_inv_dct_matches_closed_form(n):
    """inv_dct(e_k) must reproduce the DCT-II basis column within
    integer rounding: X[i] = sum_k x_k * cos((2i+1)k*pi/2N) * sqrt-
    normalization folded into the 2^12 fixed point + the network's
    internal 1/2 scale."""
    rng = np.random.default_rng(n)
    x = rng.integers(-255, 256, n).astype(float)
    lo, hi = -(1 << 20), (1 << 20) - 1
    got = np.asarray(I.inv_dct([int(v) for v in x], lo, hi), float)
    # float reference: inverse of the unnormalized forward DCT the
    # AV1 integer network implements (orthonormal up to the 1/2 per
    # stage folded scale): out[i] = sum_k c_k x_k cos((2i+1)k pi/2n)
    i = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    basis = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    want = (basis * np.where(k == 0, 1 / np.sqrt(2), 1.0)
            * x[None, :]).sum(axis=1)
    assert np.allclose(got, want, atol=1.5 + n / 16), (got, want)


@pytest.mark.parametrize("n", [8, 16])
def test_inv_adst_matches_closed_form(n):
    rng = np.random.default_rng(n + 100)
    x = rng.integers(-255, 256, n).astype(float)
    lo, hi = -(1 << 20), (1 << 20) - 1
    fn = {8: I.inv_adst8, 16: I.inv_adst16}[n]
    got = np.asarray(fn([int(v) for v in x], lo, hi), float)
    i = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    basis = np.sin((2 * i + 1) * (2 * k + 1) * np.pi / (4 * n))
    want = (basis * x[None, :]).sum(axis=1)
    assert np.allclose(got, want, atol=1.5 + n / 16), (got, want)


def test_inv_adst4_matches_matrix_form():
    """The SINPI network must equal the explicit matrix formulation
    (spec 7.13.2.6): o = Round2(M @ x, 12) with
    M = [[S1,S3,S4,S2],[S2,S3,-S1,-S4],[S3,0,-S3,S3],
         [S1+S2,-S3,S4-S1,S2-S4]]."""
    S1, S2, S3, S4 = 1321, 2482, 3344, 3803
    M = np.array([[S1, S3, S4, S2],
                  [S2, S3, -S1, -S4],
                  [S3, 0, -S3, S3],
                  [S1 + S2, -S3, S4 - S1, S2 - S4]], np.int64)
    rng = np.random.default_rng(42)
    for _ in range(50):
        x = rng.integers(-(1 << 15), 1 << 15, 4)
        got = I.inv_adst4([int(v) for v in x], 0, 0)
        want = (M @ x + 2048) >> 12
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# native differential sweep (bit-exact, wrap semantics included)
# ---------------------------------------------------------------------------

def _both(c, tx, tt, bd, lossless, monkeypatch):
    monkeypatch.setenv("FFPIC_AV1_HOST_ITX", "0")
    want = I.inverse_transform_batch(c, tx, tt, bd, lossless)
    monkeypatch.setenv("FFPIC_AV1_HOST_ITX", "1")
    got = I.inverse_transform_batch(c, tx, tt, bd, lossless)
    return got, want


def test_native_itx_differential_sweep(monkeypatch):
    from ffpic_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    for tx, tt, w, h in _legal_combos():
        adj = adjusted_tx_size(tx)
        aw, ah = TX_W[adj], TX_H[adj]
        for bd in (8, 10):
            B = int(rng.integers(1, 7))
            lim = 1 << (bd + 7)        # dequant clamp range
            c = rng.integers(-lim, lim, (B, ah, aw)).astype(np.int32)
            got, want = _both(c, tx, tt, bd, False, monkeypatch)
            np.testing.assert_array_equal(
                got, want, err_msg=f"tx={tx} tt={tt} bd={bd}")


def test_native_itx_int32_wrap_parity(monkeypatch):
    """Fuzz-grade inputs: full-range int32 coefficients must produce
    identical (wrapped) results — the C path must never be 'more
    correct' than the numpy oracle on corrupt streams."""
    from ffpic_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    for tx in (0, 3, 5, 9, 13, 16, 18):
        adj = adjusted_tx_size(tx)
        aw, ah = TX_W[adj], TX_H[adj]
        c = rng.integers(-2**31, 2**31 - 1, (4, ah, aw),
                         dtype=np.int64).astype(np.int32)
        got, want = _both(c, tx, 0, 8, False, monkeypatch)
        np.testing.assert_array_equal(got, want, err_msg=f"tx={tx}")


def test_native_wht_differential(monkeypatch):
    from ffpic_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    c = rng.integers(-(1 << 15), 1 << 15, (33, 4, 4)).astype(np.int32)
    got, want = _both(c, 0, 0, 8, True, monkeypatch)
    np.testing.assert_array_equal(got, want)
