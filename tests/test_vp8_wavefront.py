"""VP8 device intra-prediction wavefront (SURVEY §7 hard part 2):
the lax.scan anti-diagonal reconstructor must match the host
reconstruction bit-exactly (full luma semantics incl. all ten
B-modes, virtual 127/129 edges, above-right clamp + the interior
right-column quirk).

The perf verdict lives in PARITY.md ("vp8 device wavefront"): the
device formulation is ~180x slower than host C — this test pins
CORRECTNESS so the measured experiment stays reproducible.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _capture(data):
    """Decode through the python (non-fused) path, capturing the
    wavefront inputs + the host luma output."""
    from ffpic_tpu.formats import vp8 as V
    from ffpic_tpu.formats import webp as W
    cap = {}
    orig = V.VP8Decoder.decode

    def hook(self):
        self._parse_control_partition()
        self._dequant_tables()
        self._parse_mb_headers()
        self._parse_tokens()
        self._residuals()
        self._reconstruct()
        cap["res"] = self.residual[:, :, :16].astype(np.int32)
        cap["ymode"] = np.asarray(self.ymode, np.int32).copy()
        cap["bmodes"] = np.asarray(self.bmodes, np.int32) \
            .reshape(self.mbh, self.mbw, 16).copy()
        cap["Y"] = self.Y.copy()
        cap["mb"] = (self.mbh, self.mbw)
        from ffpic_tpu.formats.vp8_filter import loop_filter_frame
        loop_filter_frame(self)
        return self.Y, self.U, self.V

    V.VP8Decoder.decode = hook
    try:
        W.load(data)
    finally:
        V.VP8Decoder.decode = orig
    return cap


def test_wavefront_bit_exact(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(9)
    im = (np.linspace(0, 255, 64)[None, :] +
          np.linspace(0, 128, 64)[:, None] +
          rng.integers(0, 40, (64, 64))).clip(0, 255).astype(np.uint8)
    rgb = np.stack([im, im[::-1], im], -1)
    fn = tmp_path / "t.webp"
    Image.fromarray(rgb).save(fn, "WEBP", quality=70, method=2)
    data = open(fn, "rb").read()
    cap = _capture(data)
    from ffpic_tpu.ops.vp8_wavefront import make_wavefront
    run = make_wavefront(*cap["mb"])
    Yw = np.asarray(run(cap["res"], cap["ymode"], cap["bmodes"]))
    assert (Yw == cap["Y"]).all()


def test_wavefront_corpus_512():
    path = os.path.join(REPO, "corpus", "webp_512.webp")
    if not os.path.exists(path):
        pytest.skip("corpus not generated")
    data = open(path, "rb").read()
    cap = _capture(data)
    from ffpic_tpu.ops.vp8_wavefront import make_wavefront
    run = make_wavefront(*cap["mb"])
    Yw = np.asarray(run(cap["res"], cap["ymode"], cap["bmodes"]))
    bad = int((Yw != cap["Y"]).sum())
    assert bad == 0, f"{bad} luma mismatches"
