"""Model-facing pipeline (BASELINE.json config 5): batched mixed-format
decode -> on-device resize/normalize -> ViT consumption, plus the
multi-chip dryrun path."""

import io
import os

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mixed_files(tmp_path_factory):
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("mixed")
    paths = []
    for i, fmt in enumerate(["JPEG", "PNG", "WEBP"]):
        arr = rng.integers(0, 256, (40 + 8 * i, 56, 3), dtype=np.uint8)
        p = d / f"img{i}.{fmt.lower()}"
        kw = {"lossless": False, "quality": 70} if fmt == "WEBP" else {}
        Image.fromarray(arr).save(p, fmt, **kw)
        paths.append(str(p))
    return paths


def test_decode_batch_mixed_resize(mixed_files):
    import ffpic_tpu
    batch = ffpic_tpu.decode_batch(mixed_files, size=(64, 64))
    assert batch.shape == (3, 64, 64, 4)
    assert batch.dtype.name == "uint8"
    # content sanity: each decoded image is non-constant
    b = np.asarray(batch)
    assert all(b[i].std() > 5 for i in range(3))


def test_normalize_feeds_vit(mixed_files):
    import jax
    import ffpic_tpu
    from ffpic_tpu.ops.resize import normalize_for_model
    from ffpic_tpu.models import vit

    cfg = vit.VIT_TINY
    batch = ffpic_tpu.decode_batch(mixed_files, size=(cfg.image_size,
                                                      cfg.image_size))
    x = normalize_for_model(batch)
    assert x.shape == (3, cfg.image_size, cfg.image_size, 3)
    params = vit.init_params(cfg, jax.random.PRNGKey(0))
    logits = jax.jit(lambda p, im: vit.forward(cfg, p, im))(params, x)
    assert logits.shape == (3, cfg.n_classes)
    assert np.isfinite(np.asarray(logits)).all()


def test_sharded_decode_on_mesh(rng):
    from ffpic_tpu.parallel import make_mesh, sharded_decode_420
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(model_parallel=1)
    N = len(jax.devices())
    ycoef = rng.integers(-128, 128, (N, 4, 4, 8, 8)).astype(np.int16)
    ucoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    vcoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    q = np.full((8, 8), 8, np.int32)
    out = sharded_decode_420(mesh, ycoef, ucoef, vcoef, q, q)
    assert out.shape == (N, 32, 32, 4)
    # sharded over data axis
    assert len(out.sharding.device_set) == N


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, REPO)
    import importlib
    ge = importlib.import_module("__graft_entry__")
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 128, 128, 4)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, REPO)
    import importlib
    import jax
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(len(jax.devices()))


def test_sharded_equals_single_device(rng):
    """Per-device sharded result must equal the single-device result."""
    from ffpic_tpu.parallel import make_mesh, sharded_decode_420
    from ffpic_tpu.ops.jpeg_kernels import decode_batch_420
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(model_parallel=1)
    N = len(jax.devices())
    ycoef = rng.integers(-128, 128, (N, 4, 4, 8, 8)).astype(np.int16)
    ucoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    vcoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    q = np.full((8, 8), 8, np.int32)
    sharded = np.asarray(
        sharded_decode_420(mesh, ycoef, ucoef, vcoef, q, q))
    single = np.asarray(decode_batch_420(
        *(jax.numpy.asarray(a) for a in (ycoef, ucoef, vcoef)), q, q))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_ragged_batch(rng):
    """N not divisible by the data-axis size: padded + sliced back."""
    from ffpic_tpu.parallel import make_mesh, sharded_decode_420
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(model_parallel=1)
    N = len(jax.devices()) + 1  # ragged
    ycoef = rng.integers(-128, 128, (N, 4, 4, 8, 8)).astype(np.int16)
    ucoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    vcoef = rng.integers(-64, 64, (N, 2, 2, 8, 8)).astype(np.int16)
    q = np.full((8, 8), 8, np.int32)
    out = sharded_decode_420(mesh, ycoef, ucoef, vcoef, q, q)
    assert out.shape == (N, 32, 32, 4)


def test_decode_batch_coalesces_same_geometry(tmp_path):
    """Same-geometry JPEGs go through ONE coalesced launch and equal
    their individual decodes."""
    import jax.numpy as jnp
    import ffpic_tpu
    from ffpic_tpu.formats import jpg
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
        p = tmp_path / f"b{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=80 + 5 * i,
                                  subsampling="4:2:0")
        paths.append(str(p))
    batch = np.asarray(ffpic_tpu.decode_batch(paths))
    assert batch.shape == (3, 64, 80, 4)
    for i, p in enumerate(paths):
        single = jpg.load(open(p, "rb").read(), order="rgba",
                          mode="bt601")[0].np_pixels()
        np.testing.assert_array_equal(batch[i], single[:64, :80])


def test_decode_batch_on_mesh(mixed_files):
    import jax
    import ffpic_tpu
    from ffpic_tpu.parallel import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(model_parallel=1)
    batch = ffpic_tpu.decode_batch(mixed_files, size=(32, 32), mesh=mesh)
    assert batch.shape[0] == 3
    assert len(batch.sharding.device_set) >= 1


def test_decode_batch_sparse_staging(tmp_path):
    """Smooth (photo-like) JPEGs trigger the packed-coefficient staging
    path; result equals the individual dense decodes exactly."""
    import ffpic_tpu
    from ffpic_tpu.formats import jpg
    rng = np.random.default_rng(4)
    # smooth gradient -> very sparse coefficients
    gx = np.linspace(0, 255, 128, dtype=np.float64)
    base = (gx[None, :, None] * np.ones((96, 1, 3))).astype(np.uint8)
    paths = []
    for i in range(2):
        p = tmp_path / f"s{i}.jpg"
        Image.fromarray(np.roll(base, 7 * i, axis=1)).save(
            p, "JPEG", quality=85, subsampling="4:2:0")
        paths.append(str(p))
    batch = np.asarray(ffpic_tpu.decode_batch(paths))
    for i, p in enumerate(paths):
        single = jpg.load(open(p, "rb").read(), order="rgba",
                          mode="bt601")[0].np_pixels()
        np.testing.assert_array_equal(batch[i], single[:96, :128])
    # confirm the sparse branch is actually the chosen one here
    from ffpic_tpu.ops.jpeg_kernels import pack_coeffs
    j, _ = jpg.parse_and_decode(open(paths[0], "rb").read())
    idx, val = pack_coeffs(j.coeffs[0])
    assert (idx.nbytes + val.nbytes) < j.coeffs[0].nbytes * 0.7 * 3


def test_decode_batch_mesh_bucket_sharded_equals_single(tmp_path):
    """With mesh=, each same-geometry JPEG bucket routes through ONE
    sharded launch over the data axis (VERDICT r2 #7); output must be
    pixel-identical to the single-device path, ragged N included."""
    import jax
    import ffpic_tpu
    from ffpic_tpu.parallel import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rng = np.random.default_rng(9)
    paths = []
    for i in range(5):          # 5 % 8 devices != 0 -> ragged
        arr = np.kron(rng.integers(0, 256, (6, 8, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        p = tmp_path / f"m{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=85 + i,
                                  subsampling="4:2:0")
        paths.append(str(p))
    mesh = make_mesh(model_parallel=1)
    sharded = np.asarray(ffpic_tpu.decode_batch(paths, mesh=mesh))
    single = np.asarray(ffpic_tpu.decode_batch(paths))
    assert sharded.shape == single.shape
    np.testing.assert_array_equal(sharded, single)


def test_decode_batch_device_entropy_path(tmp_path):
    """DRI'd baseline JPEG batches route through the device-side
    entropy decoder (forced on CPU via FFPIC_DEVICE_ENTROPY=1) and
    must be pixel-identical to the host path."""
    import os
    import ffpic_tpu
    rng = np.random.default_rng(6)
    paths = []
    for i in range(5):
        arr = np.kron(rng.integers(0, 256, (6, 8, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        p = tmp_path / f"d{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=80 + i,
                                  subsampling="4:2:0",
                                  restart_marker_rows=1)
        paths.append(str(p))
    # plus one non-DRI jpeg that must stay on the host path
    extra = tmp_path / "plain.jpg"
    Image.fromarray(np.kron(rng.integers(0, 256, (6, 8, 3)),
                            np.ones((16, 16, 1))).astype(np.uint8)) \
        .save(extra, "JPEG", quality=85, subsampling="4:2:0")
    paths.append(str(extra))

    os.environ["FFPIC_DEVICE_ENTROPY"] = "1"
    try:
        dev = np.asarray(ffpic_tpu.decode_batch(paths))
    finally:
        del os.environ["FFPIC_DEVICE_ENTROPY"]
    host = np.asarray(ffpic_tpu.decode_batch(paths))
    np.testing.assert_array_equal(dev, host)


def test_decode_batch_threaded_parse(tmp_path):
    """FFPIC_THREADS>1: host-pooled read+entropy+staging must be
    pixel-identical to serial (per-thread packed scratch)."""
    import os
    import ffpic_tpu
    rng = np.random.default_rng(8)
    paths = []
    for i in range(6):
        arr = np.kron(rng.integers(0, 256, (6, 8, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        p = tmp_path / f"t{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=82 + i,
                                  subsampling="4:2:0")
        paths.append(str(p))
    os.environ["FFPIC_THREADS"] = "4"
    try:
        pooled = np.asarray(ffpic_tpu.decode_batch(paths))
    finally:
        del os.environ["FFPIC_THREADS"]
    os.environ["FFPIC_THREADS"] = "1"
    try:
        serial = np.asarray(ffpic_tpu.decode_batch(paths))
    finally:
        del os.environ["FFPIC_THREADS"]
    np.testing.assert_array_equal(pooled, serial)


def test_decode_batch_uses_spec_entropy_path(rng, monkeypatch):
    """DRI-less same-table JPEG groups route through the speculative
    self-sync device entropy launch when FFPIC_SPEC_ENTROPY=1
    (FFPIC_DEVICE_ENTROPY=1 forces device paths on CPU for tests)."""
    import io

    import numpy as np
    from PIL import Image

    import ffpic_tpu

    monkeypatch.setenv("FFPIC_DEVICE_ENTROPY", "1")
    monkeypatch.setenv("FFPIC_SPEC_ENTROPY", "1")
    datas = []
    for _ in range(4):
        arr = np.kron(rng.integers(0, 256, (4, 6, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=85,
                                  subsampling="4:2:0")
        datas.append(b.getvalue())
    from ffpic_tpu.formats import jpg as _jpg
    from ffpic_tpu.ops import jpeg_entropy_device as _jed
    js = [_jpg.parse_and_decode(d, skip_decode=True)[0] for d in datas]
    assert all(_jed.spec_eligible(j) for j in js)
    assert len({_jed.spec_group_key(j) for j in js}) == 1

    batch = np.asarray(ffpic_tpu.decode_batch(datas))
    for i, d in enumerate(datas):
        want = _jpg.load(d, mode="bt601")[0].np_pixels()
        np.testing.assert_array_equal(
            batch[i][:want.shape[0], :want.shape[1]], want,
            err_msg=f"img {i}")


def test_decode_batch_hybrid_split(rng, monkeypatch, tmp_path):
    """All-DRI batches of >= 6 split between the device entropy
    engine and the host packed path (hybrid scheduling) — the split
    must be pixel-identical to the host-only batch, including with
    mixed sizes/tables inside the batch."""
    import io

    import numpy as np
    from PIL import Image

    import ffpic_tpu

    datas = []
    for i in range(8):
        arr = np.kron(rng.integers(0, 256, (4 + (i & 1), 6, 3)),
                      np.ones((16, 16, 1))).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, "JPEG", quality=80 + i,
                                  subsampling="4:2:0",
                                  restart_marker_rows=1)
        datas.append(b.getvalue())

    from ffpic_tpu.formats import jpg as _jpg
    from ffpic_tpu.ops import jpeg_entropy_device as _jed
    js = [_jpg.parse_and_decode(d, skip_decode=True)[0] for d in datas]
    assert all(_jed.eligible(j) for j in js)

    monkeypatch.setenv("FFPIC_DEVICE_ENTROPY", "1")
    hyb = np.asarray(ffpic_tpu.decode_batch(datas,
                                            size=(80, 96)))
    monkeypatch.setenv("FFPIC_DEVICE_ENTROPY", "0")
    host = np.asarray(ffpic_tpu.decode_batch(datas, size=(80, 96)))
    np.testing.assert_array_equal(hyb, host)


def test_moe_ep_sp_train_step():
    """MoE block over the 4-axis (data, seq, expert, model) mesh:
    sequence-parallel activations, expert-parallel FFN weights, one
    train step executes with XLA-inserted collectives (the ep/sp
    scenario of dryrun_multichip)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from ffpic_tpu.models import moe

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2, 1)
    mesh = Mesh(devs, axis_names=("data", "seq", "expert", "model"))
    cfg = moe.MOE_TINY
    with mesh:
        params = moe.init_params(cfg, jax.random.PRNGKey(1))
        sh = moe.param_shardings(cfg, mesh)
        params = jax.tree.map(lambda x, s: jax.device_put(x, s),
                              params, sh)
        xsh = NamedSharding(mesh, P("data", "seq", None))
        lsh = NamedSharding(mesh, P("data"))
        x = jax.device_put(
            np.random.default_rng(2).normal(
                size=(2, cfg.seq_len, cfg.d_model)).astype(np.float32),
            xsh)
        lbl = jax.device_put(np.array([0, 1], np.int32), lsh)
        step = jax.jit(moe.make_train_step(cfg),
                       in_shardings=(sh, xsh, lsh),
                       out_shardings=(sh, NamedSharding(mesh, P())))
        params2, loss = step(params, x, lbl)
        assert np.isfinite(float(loss))
        # a second step with updated params still runs (shapes stable)
        _, loss2 = step(params2, x, lbl)
        assert float(loss2) <= float(loss) + 1.0
