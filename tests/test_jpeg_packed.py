"""Packed-emission JPEG fast path: host emits (counts, ks, vals) in
MCU decode order (native host_jpeg.c ffpic_jpeg_decode_scan_packed),
the device rebuilds dense coefficient tensors with one scatter-add
(ops/jpeg_kernels._unpack_coeffs) — must match the dense scan decoder
bit-exactly on every eligible corpus file, including restart-interval
streams (the reference's DRI handling, format/jpg.c:562-573).
"""

import io
import os

import numpy as np
import pytest

from ffpic_tpu.formats import jpg

CORPUS = os.path.join(os.path.dirname(__file__), "..", "corpus")

ELIGIBLE = [
    "jpeg_160_420.jpg", "jpeg_160_444.jpg", "jpeg_512_420.jpg",
    "jpeg_512_422.jpg", "jpeg_512_444.jpg", "jpeg_gray_512.jpg",
    "jpeg_q30_512_420.jpg", "jpeg_q95_512_420.jpg",
]


def _packed_vs_dense(data: bytes):
    jp, _ = jpg.parse_and_decode(data, packed=True)
    counts, ks, vals, nnz = jp.packed
    # parse again densely (the packed scratch is shared — copy first)
    counts, ks, vals = counts.copy(), ks.copy(), vals.copy()
    jd, _ = jpg.parse_and_decode(data)

    import jax.numpy as jnp
    from ffpic_tpu.ops.jpeg_kernels import _unpack_coeffs

    shapes = tuple((c.nby, c.nbx) for c in jp.comps)
    bmap = jpg.packed_block_map(jp)
    out = _unpack_coeffs(jnp.asarray(counts), jnp.asarray(ks),
                         jnp.asarray(vals), bmap, shapes)
    for ci, c in enumerate(jp.comps):
        dense = jd.coeffs[ci].reshape(c.nby, c.nbx, 8, 8)
        assert np.array_equal(np.asarray(out[ci]), dense), f"comp {ci}"
    assert nnz == int(counts.sum())


@pytest.mark.parametrize("name", ELIGIBLE)
def test_packed_matches_dense(name):
    with open(os.path.join(CORPUS, name), "rb") as f:
        data = f.read()
    _packed_vs_dense(data)


def test_packed_restart_intervals():
    """DRI streams: segment boundaries + predictor resets must agree
    with the dense path."""
    from PIL import Image
    rng = np.random.default_rng(7)
    im = Image.fromarray(rng.integers(0, 255, (120, 200, 3), np.uint8))
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=90, subsampling="4:2:0",
            restart_marker_blocks=3)
    data = buf.getvalue()
    assert b"\xff\xdd" in data
    _packed_vs_dense(data)


def test_packed_progressive_raises():
    with open(os.path.join(CORPUS, "jpeg_prog_512_420.jpg"), "rb") as f:
        data = f.read()
    with pytest.raises(jpg.PackedIneligible):
        jpg.parse_and_decode(data, packed=True)


def test_packed_pixels_match_dense_pipeline():
    """Full fused packed launch == dense decode_batch_420 pixels."""
    import jax.numpy as jnp
    from ffpic_tpu.ops.jpeg_kernels import (decode_batch_420,
                                            decode_frame_420_packed,
                                            mcu_block_map)
    with open(os.path.join(CORPUS, "jpeg_512_420.jpg"), "rb") as f:
        data = f.read()
    jp, _ = jpg.parse_and_decode(data, packed=True)
    counts, ks, vals, _nnz = jp.packed
    samps = tuple((c.v, c.h) for c in jp.comps)
    shapes = tuple((c.nby, c.nbx) for c in jp.comps)
    bmap = mcu_block_map(samps, jp.mcus_x, jp.mcus_y)
    yq = jnp.asarray(jp.dqt[jp.comps[0].tq].reshape(8, 8))
    cq = jnp.asarray(jp.dqt[jp.comps[1].tq].reshape(8, 8))
    out = decode_frame_420_packed(jnp.asarray(counts.copy()),
                                  jnp.asarray(ks.copy()),
                                  jnp.asarray(vals.copy()),
                                  bmap, yq, cq, shapes)
    jd, _ = jpg.parse_and_decode(data)
    dense = [jd.coeffs[i].reshape(1, *shapes[i], 8, 8) for i in range(3)]
    ref = decode_batch_420(*(jnp.asarray(d) for d in dense), yq, cq)[0]
    assert np.array_equal(np.asarray(out), np.asarray(ref))
