"""EXR PIZ/B44/B44A/PXR24 conformance against the REAL OpenEXR
library (libOpenEXR-3_1 + headers, present in this image): a small
C++ oracle tool is compiled on demand that writes and reads EXR
files through the reference implementation.

This closes the round-3/4 weakness that PIZ/B44 decode was validated
only by self-roundtrip through the repo's own encoder (a
consistent-but-wrong bitstream reading would pass):
  - decode direction: OpenEXR ENCODES -> our decoder must match the
    original half data (lossless comps) / OpenEXR's own decode
    (lossy comps) bit-exactly;
  - encode direction: our encoder writes -> OpenEXR DECODES -> must
    match bit-exactly (lossless) or our own decode (lossy).

The C reference (junka/ffpic format/exr.c:207) assumes uncompressed
scanlines only — all compressed paths here are beyond-reference.
"""

import hashlib
import os
import shutil
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ffpic_tpu.formats import exr  # noqa: E402

_TOOL_SRC = r"""
#include <ImfOutputFile.h>
#include <ImfInputFile.h>
#include <ImfHeader.h>
#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfCompression.h>
#include <ImathBox.h>
#include <half.h>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <string>
using namespace Imf;
using namespace Imath;
static const char *names[] = {"B","G","R","A","Q","Z2"};
int main(int argc, char **argv) {
    if (argc < 3) return 2;
    std::string mode = argv[1];
    if (mode == "w") {
        // w out.exr W H comp nchan : raw halfs on stdin (c-major)
        if (argc < 7) return 2;
        int W = atoi(argv[3]), H = atoi(argv[4]);
        int comp = atoi(argv[5]), nc = atoi(argv[6]);
        std::vector<std::vector<half>> data(nc);
        for (int c = 0; c < nc; c++) {
            data[c].resize((size_t)W * H);
            if (fread(data[c].data(), 2, (size_t)W * H, stdin)
                    != (size_t)W * H)
                return 3;
        }
        Header hdr(W, H);
        hdr.compression() = (Compression)comp;
        FrameBuffer fb;
        for (int c = 0; c < nc; c++) {
            hdr.channels().insert(names[c], Channel(HALF));
            fb.insert(names[c], Slice(HALF, (char*)data[c].data(),
                                      2, 2 * (size_t)W));
        }
        OutputFile f(argv[2], hdr);
        f.setFrameBuffer(fb);
        f.writePixels(H);
        return 0;
    }
    // r in.exr : prints "W H n name1 name2 ..." then raw halfs
    InputFile f(argv[2]);
    Box2i dw = f.header().dataWindow();
    int W = dw.max.x - dw.min.x + 1, H = dw.max.y - dw.min.y + 1;
    const ChannelList &cl = f.header().channels();
    std::vector<std::string> chn;
    for (ChannelList::ConstIterator i = cl.begin(); i != cl.end(); ++i)
        chn.push_back(i.name());
    fprintf(stderr, "%d %d %zu", W, H, chn.size());
    for (size_t c = 0; c < chn.size(); c++)
        fprintf(stderr, " %s", chn[c].c_str());
    fprintf(stderr, "\n");
    std::vector<std::vector<half>> data(chn.size());
    FrameBuffer fb;
    for (size_t c = 0; c < chn.size(); c++) {
        data[c].resize((size_t)W * H);
        fb.insert(chn[c].c_str(),
                  Slice(HALF, (char*)(data[c].data())
                        - ((size_t)dw.min.y * W + dw.min.x) * 2,
                        2, 2 * (size_t)W));
    }
    f.setFrameBuffer(fb);
    f.readPixels(dw.min.y, dw.max.y);
    for (size_t c = 0; c < chn.size(); c++)
        fwrite(data[c].data(), 2, (size_t)W * H, stdout);
    return 0;
}
"""


def _build_tool():
    h = hashlib.sha256(_TOOL_SRC.encode()).hexdigest()[:16]
    path = f"/tmp/ffpic_exr_oracle_{h}"
    if os.path.exists(path):
        return path
    if not shutil.which("g++") or \
            not os.path.exists("/usr/include/OpenEXR/ImfHuf.h"):
        return None
    src = path + ".cpp"
    with open(src, "w") as f:
        f.write(_TOOL_SRC)
    r = subprocess.run(
        ["g++", "-O2", "-o", path, src,
         "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
         "-lOpenEXR-3_1", "-lImath-3_1", "-lIex-3_1"],
        capture_output=True)
    return path if r.returncode == 0 else None


_TOOL = _build_tool()
needs_openexr = pytest.mark.skipif(
    _TOOL is None, reason="OpenEXR library/toolchain unavailable")


def _halves(nc=3, h=48, w=64, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for c in range(nc):
        smooth = np.sin(xx / (5.0 + c)) * np.cos(yy / (7.0 + c)) \
            * (c + 1.5)
        noise = rng.random((h, w)) * 0.25
        out.append((smooth + noise).astype(np.float16))
    return out


def _oracle_write(path, planes, comp):
    h, w = planes[0].shape
    raw = b"".join(p.tobytes() for p in planes)
    r = subprocess.run(
        [_TOOL, "w", path, str(w), str(h), str(comp),
         str(len(planes))], input=raw, capture_output=True)
    assert r.returncode == 0, r.stderr[:200]


def _oracle_read(path):
    r = subprocess.run([_TOOL, "r", path], capture_output=True)
    assert r.returncode == 0, r.stderr[:200]
    head = r.stderr.decode().split()
    w, h, n = int(head[0]), int(head[1]), int(head[2])
    names = head[3:3 + n]
    arr = np.frombuffer(r.stdout, np.float16).reshape(n, h, w)
    return {nm: arr[i] for i, nm in enumerate(names)}


# channel order written by the oracle (its iterator sorts by name)
_W_NAMES = ["B", "G", "R", "A", "Q", "Z2"]


@needs_openexr
@pytest.mark.parametrize("comp", [1, 2, 3, 4, 5])
def test_decode_openexr_written_lossless(comp):
    """RLE/ZIPS/ZIP/PIZ/PXR24: files written by the REAL OpenEXR
    encoder decode bit-exactly to the source halfs (all are lossless
    for HALF channels, including PXR24)."""
    planes = _halves()
    path = f"/tmp/ffpic_oracle_c{comp}.exr"
    _oracle_write(path, planes, comp)
    with open(path, "rb") as f:
        pl = exr.load(f.read())[0].meta["exr_planes"]
    for i, nm in enumerate(_W_NAMES[:len(planes)]):
        ours = pl[nm].astype(np.float32)
        want = planes[i].astype(np.float32)
        assert np.array_equal(ours, want), \
            f"comp {comp} chan {nm}: " \
            f"{np.abs(ours - want).max()} max err"


@needs_openexr
@pytest.mark.parametrize("comp", [6, 7])
def test_decode_openexr_written_b44(comp):
    """B44/B44A: lossy, but DECODE is deterministic — our decoder
    must match OpenEXR's own decode of its file bit-exactly."""
    planes = _halves(seed=11)
    path = f"/tmp/ffpic_oracle_c{comp}.exr"
    _oracle_write(path, planes, comp)
    ref = _oracle_read(path)
    with open(path, "rb") as f:
        pl = exr.load(f.read())[0].meta["exr_planes"]
    for nm, want in ref.items():
        ours = pl[nm].astype(np.float32)
        assert np.array_equal(ours, want.astype(np.float32)), \
            f"comp {comp} chan {nm} mismatch"


@needs_openexr
@pytest.mark.parametrize("comp", [1, 3, 4])
def test_encode_read_by_openexr(comp):
    """Our ENCODER's RLE/ZIP/PIZ bitstreams decode correctly in the
    REAL OpenEXR reader (kills consistent-but-wrong encodings)."""
    planes = _halves(seed=13)
    names = ["B", "G", "R"]
    blob = exr.write_exr(list(zip(names, planes)), compression=comp)
    path = f"/tmp/ffpic_ours_c{comp}.exr"
    with open(path, "wb") as f:
        f.write(blob)
    ref = _oracle_read(path)
    for nm, want in zip(names, planes):
        got = ref[nm].astype(np.float32)
        assert np.array_equal(got, want.astype(np.float32)), \
            f"comp {comp} chan {nm}: OpenEXR read mismatch"


@needs_openexr
def test_encode_b44_read_by_openexr():
    """Our B44 encoder: OpenEXR's decode of our file must equal OUR
    decode of our file (deterministic lossy decode both sides)."""
    planes = _halves(seed=17)
    names = ["B", "G", "R"]
    blob = exr.write_exr(list(zip(names, planes)), compression=6)
    path = "/tmp/ffpic_ours_b44.exr"
    with open(path, "wb") as f:
        f.write(blob)
    ref = _oracle_read(path)
    pl = exr.load(blob)[0].meta["exr_planes"]
    for nm in names:
        assert np.array_equal(pl[nm].astype(np.float32),
                              ref[nm].astype(np.float32)), \
            f"chan {nm}: OpenEXR vs our decode of our B44 file"


@needs_openexr
@pytest.mark.parametrize("dims", [(1, 1), (3, 5), (16, 16),
                                  (17, 31), (128, 97)])
def test_decode_piz_geometries(dims):
    """PIZ across odd/small/large geometries vs the real encoder
    (exercises bitmap/LUT edge cases and wavelet odd sizes)."""
    h, w = dims
    planes = _halves(nc=2, h=h, w=w, seed=h * 100 + w)
    path = f"/tmp/ffpic_oracle_piz_{h}x{w}.exr"
    _oracle_write(path, planes, 4)
    with open(path, "rb") as f:
        pl = exr.load(f.read())[0].meta["exr_planes"]
    for i, nm in enumerate(_W_NAMES[:2]):
        assert np.array_equal(pl[nm].astype(np.float32),
                              planes[i].astype(np.float32)), \
            f"{h}x{w} chan {nm}"


@needs_openexr
@pytest.mark.parametrize("comp", [8, 9])
def test_decode_openexr_written_dwa(comp):
    """DWAA/DWAB: RLE (A) and UNKNOWN (Q, Z2) channels must match
    OpenEXR's decode bit-exactly; lossy-DCT channels (B, G, R CSC
    set) are float-path-defined — OpenEXR's own scalar/SSE/AVX
    builds differ in final-half rounding — so they must be >= 99.8%
    bit-exact with every remaining pixel within 6 output half-ULPs
    (one half-ULP in the nonlinear quantization space through the
    exp segment of the toLinear curve)."""
    planes = _halves(nc=5, h=100, w=90, seed=3)
    path = f"/tmp/ffpic_oracle_c{comp}.exr"
    _oracle_write(path, planes, comp)
    ref = _oracle_read(path)
    with open(path, "rb") as f:
        pl = exr.load(f.read())[0].meta["exr_planes"]
    for nm, want in ref.items():
        ours = np.asarray(pl[nm], np.float16)
        if nm in ("A", "Q"):
            assert np.array_equal(ours.view(np.uint16),
                                  want.view(np.uint16)), nm
            continue
        ob = ours.view(np.uint16).astype(np.int64)
        wb = want.view(np.uint16).astype(np.int64)
        d = np.abs(ob - wb)
        frac = (d != 0).mean()
        assert frac <= 0.002, (nm, frac)
        assert d.max() <= 6, (nm, int(d.max()))


@needs_openexr
def test_decode_dwa_tall_blocks():
    """DWAB's 256-line blocks + odd dims + partial bottom block."""
    planes = _halves(nc=3, h=300, w=90, seed=4)
    path = "/tmp/ffpic_oracle_dwab_tall.exr"
    _oracle_write(path, planes, 9)
    ref = _oracle_read(path)
    with open(path, "rb") as f:
        pl = exr.load(f.read())[0].meta["exr_planes"]
    for nm, want in ref.items():
        ours = np.asarray(pl[nm], np.float16)
        ob = ours.view(np.uint16).astype(np.int64)
        wb = want.view(np.uint16).astype(np.int64)
        d = np.abs(ob - wb)
        assert (d != 0).mean() <= 0.002 and d.max() <= 6, nm
