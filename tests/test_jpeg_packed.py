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


def test_decode_batch_420_packed_matches_per_frame(rng):
    """Batched packed launch (stacked staging, one launch per bucket)
    is pixel-identical to the per-frame packed path and the host
    decode, across members with different nnz."""
    import io

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ffpic_tpu.formats import jpg
    from ffpic_tpu.formats.jpg import packed_block_map
    from ffpic_tpu.ops.jpeg_kernels import (decode_batch_420_packed,
                                            decode_frame_420_packed,
                                            stack_packed)

    datas = []
    for q in (60, 85, 95):
        arr = np.kron(rng.integers(0, 256, (4, 6, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=q,
                                  subsampling="4:2:0")
        datas.append(b.getvalue())

    # copy each parse's packed emission IMMEDIATELY: the native
    # emission is a thread-local scratch view that the next parse
    # overwrites (native/__init__.py packed-scratch note)
    js, packed = [], []
    for d in datas:
        j, _ = jpg.parse_and_decode(d, packed=True)
        c, k, v, nnz = j.packed
        packed.append((np.array(c), np.array(k), np.array(v), nnz))
        js.append(j)
    j0 = js[0]
    shapes = tuple((c.nby, c.nbx) for c in j0.comps)
    bmap = packed_block_map(j0)
    cts, kss, vls = stack_packed(packed)
    yq = jnp.asarray(np.stack([j.dqt[j.comps[0].tq].reshape(8, 8)
                               for j in js])[:, None, None])
    cq = jnp.asarray(np.stack([j.dqt[j.comps[1].tq].reshape(8, 8)
                               for j in js])[:, None, None])
    out = np.asarray(decode_batch_420_packed(
        jnp.asarray(cts), jnp.asarray(kss), jnp.asarray(vls), bmap,
        yq, cq, shapes, mode="bt601"))
    for i, (d, j) in enumerate(zip(datas, js)):
        c, k, v, _ = packed[i]
        one = np.asarray(decode_frame_420_packed(
            jnp.asarray(c), jnp.asarray(k), jnp.asarray(v), bmap,
            jnp.asarray(j.dqt[j.comps[0].tq].reshape(8, 8)),
            jnp.asarray(j.dqt[j.comps[1].tq].reshape(8, 8)),
            shapes, mode="bt601"))
        np.testing.assert_array_equal(out[i], one, err_msg=f"img {i}")
        want = jpg.load(d, mode="bt601")[0].np_pixels()
        np.testing.assert_array_equal(
            out[i][:want.shape[0], :want.shape[1]], want,
            err_msg=f"vs host img {i}")


def test_decode_frame_420_packed_fused_matches(rng):
    """Single-transfer fused staging == three-array packed path."""
    import io

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ffpic_tpu.formats import jpg
    from ffpic_tpu.formats.jpg import packed_block_map
    from ffpic_tpu.ops.jpeg_kernels import (decode_frame_420_packed,
                                            decode_frame_420_packed_fused,
                                            fuse_packed)

    arr = np.kron(rng.integers(0, 256, (4, 6, 3)),
                  np.ones((16, 16, 1))).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=85,
                              subsampling="4:2:0")
    j, _ = jpg.parse_and_decode(b.getvalue(), packed=True)
    c, k, v, nnz = j.packed
    shapes = tuple((cc.nby, cc.nbx) for cc in j.comps)
    bmap = packed_block_map(j)
    yq = jnp.asarray(j.dqt[j.comps[0].tq].reshape(8, 8))
    cq = jnp.asarray(j.dqt[j.comps[1].tq].reshape(8, 8))
    ref = np.asarray(decode_frame_420_packed(
        jnp.asarray(np.array(c)), jnp.asarray(np.array(k)),
        jnp.asarray(np.array(v)), bmap, yq, cq, shapes, mode="bt601"))
    buf = fuse_packed(c, k, v)
    got = np.asarray(decode_frame_420_packed_fused(
        jnp.asarray(buf), bmap, yq, cq, len(c), len(k), shapes,
        mode="bt601"))
    np.testing.assert_array_equal(got, ref)
