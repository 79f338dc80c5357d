"""Run the compiled C reference decoder (refbuild/transbmp) and return
its BGRA output — the conformance oracle for format decoders."""

import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRANSBMP = os.path.join(REPO, "refbuild", "transbmp")
PICINFO = os.path.join(REPO, "refbuild", "picinfo")


def have_reference() -> bool:
    return os.path.exists(TRANSBMP)


def _read_bmp_bgra(path: str) -> np.ndarray:
    """Read the 32bpp top-down BMP the reference's bmpwriter emits
    (display/bmpwriter.c:19-46)."""
    with open(path, "rb") as f:
        data = f.read()
    import struct
    off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    top_down = h < 0
    h = abs(h)
    if bpp == 32:
        arr = np.frombuffer(data, np.uint8, w * h * 4, off).reshape(h, w, 4)
    elif bpp == 24:
        pitch = (w * 3 + 3) & ~3
        arr = np.frombuffer(data, np.uint8, pitch * h, off).reshape(h, pitch)
        arr = arr[:, :w * 3].reshape(h, w, 3)
        arr = np.dstack([arr, np.full((h, w), 255, np.uint8)])
    else:
        raise ValueError(f"unsupported bmp bpp {bpp}")
    if not top_down:
        arr = arr[::-1]
    return arr.copy()


def ref_decode_bgra(image_path: str) -> np.ndarray:
    """Decode with the C reference; returns (H, W, 4) uint8 BGRA."""
    with tempfile.TemporaryDirectory() as td:
        tmp_img = os.path.join(td, os.path.basename(image_path))
        with open(image_path, "rb") as src, open(tmp_img, "wb") as dst:
            dst.write(src.read())
        subprocess.run([TRANSBMP, tmp_img], cwd=td, check=True,
                       capture_output=True, timeout=120)
        bmps = [f for f in os.listdir(td) if f.endswith(".bmp")]
        if not bmps:
            raise RuntimeError("reference produced no BMP")
        return _read_bmp_bgra(os.path.join(td, bmps[0]))


def ref_info(image_path: str) -> str:
    out = subprocess.run([PICINFO, image_path], capture_output=True,
                         timeout=60)
    return out.stderr.decode("utf8", "replace") + out.stdout.decode("utf8", "replace")
