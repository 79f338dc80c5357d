"""ASAN fuzz campaign for the native decoders.

Builds the host C library with AddressSanitizer, then runs random-byte
AND structure-aware mutations (box sizes, JPEG marker lengths, DHT
counts, RIFF chunk sizes) through the full decode paths.  Any heap
overflow/UAF aborts the run with an ASAN report.

Usage (two-step because ASAN must be preloaded):
    python tools/fuzz_native_asan.py --build       # emits .so, prints env
    LD_PRELOAD="$(cc -print-file-name=libasan.so) \
               $(cc -print-file-name=libstdc++.so.6)" \
      ASAN_OPTIONS=detect_leaks=0 \
      FFPIC_NATIVE_SO=/tmp/ffpic_asan.so \
      python tools/fuzz_native_asan.py --run [N]

(libstdc++ must be preloaded too or ASAN's __cxa_throw interceptor
check-fails when the JAX C++ runtime loads.)
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SO = "/tmp/ffpic_asan.so"


def build():
    src_dir = os.path.join(REPO, "ffpic_tpu", "native")
    srcs = [os.path.join(src_dir, f) for f in os.listdir(src_dir)
            if f.endswith(".c")]
    cmd = ["cc", "-O1", "-g", "-fsanitize=address", "-fPIC", "-shared",
           "-fvisibility=hidden", "-o", SO] + srcs
    subprocess.run(cmd, check=True)
    print("built", SO)
    print("run with:\n  LD_PRELOAD=$(cc -print-file-name=libasan.so) "
          f"ASAN_OPTIONS=detect_leaks=0 FFPIC_NATIVE_SO={SO} "
          "python tools/fuzz_native_asan.py --run 500")


def run(n_trials: int):
    import io
    import numpy as np
    from PIL import Image
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_fuzz_robustness import _mutate_structure

    import ffpic_tpu
    from ffpic_tpu import native
    assert native.available(), "ASAN .so not loaded"
    from ffpic_tpu.formats.pic import Pic

    corpus = []
    cdir = os.path.join(REPO, "corpus")
    for name, kind in (("jpeg_512_420.jpg", "jpeg"),
                       ("jpeg_prog_512_420.jpg", "jpeg"),
                       ("webp_512.webp", "riff"),
                       ("gif_512.gif", None),
                       ("avif_512.avif", "isobmff"),
                       ("png_512_rgba.png", None)):
        p = os.path.join(cdir, name)
        if os.path.exists(p):
            corpus.append((open(p, "rb").read(), kind))
    rng = np.random.default_rng(0)
    rgba = np.kron(rng.integers(0, 256, (4, 4, 3)),
                   np.ones((16, 16, 1)))
    rgba = np.concatenate([rgba, np.full((64, 64, 1), 255)],
                          axis=-1).astype(np.uint8)
    pic = Pic(width=64, height=64, depth=32, pitch=256, codec="raw",
              pixels=rgba)
    corpus.append((ffpic_tpu.encode(pic, "heif", qp=30), "isobmff"))
    b = io.BytesIO()
    Image.fromarray(rgba[..., :3]).save(b, "JPEG2000",
                                        irreversible=False)
    corpus.append((b.getvalue(), "isobmff"))
    b = io.BytesIO()
    Image.fromarray(rgba[..., :3]).save(b, "TIFF",
                                        compression="tiff_lzw")
    corpus.append((b.getvalue(), None))   # exercises host_lzw.c
    # screen-content AVIFs: palette blocks (small) and intrabc
    # (>=320px) exercise the pal_*/dv_*/var-tx C paths in host_av1.c
    scr = np.zeros((96, 128, 3), np.uint8)
    cols = rng.integers(0, 256, (5, 3))
    for i in range(5):
        scr[:, i * 25:(i + 1) * 25] = cols[i]
    for _ in range(10):
        x0, y0 = int(rng.integers(0, 112)), int(rng.integers(0, 88))
        scr[y0:y0 + 6, x0:x0 + 12] = rng.integers(0, 256, 3)
    b = io.BytesIO()
    Image.fromarray(scr).save(b, "AVIF", quality=40, speed=6)
    corpus.append((b.getvalue(), "isobmff"))
    big = np.tile(scr, (4, 3, 1))          # 384x384: aom uses intrabc
    b = io.BytesIO()
    Image.fromarray(big).save(b, "AVIF", quality=60, speed=6)
    corpus.append((b.getvalue(), "isobmff"))
    # our own encoder's lossless output (WHT path)
    corpus.append((ffpic_tpu.encode(pic, "AVIF", quality=100),
                   "isobmff"))

    done = 0
    for t in range(n_trials):
        data, kind = corpus[t % len(corpus)]
        d = bytearray(data)
        if kind and rng.random() < 0.5:
            d = _mutate_structure(rng, d, kind)
        for _ in range(int(rng.integers(1, 50))):
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
        try:
            ffpic_tpu.load(bytes(d))
        except (ValueError, NotImplementedError, OSError, KeyError,
                IndexError):
            pass
        done += 1
        if done % 100 == 0:
            print(f"{done}/{n_trials} mutations clean", flush=True)
    print(f"campaign complete: {done} mutations, no ASAN report")


if __name__ == "__main__":
    if "--build" in sys.argv:
        build()
    elif "--run" in sys.argv:
        n = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 300
        run(n)
    else:
        print(__doc__)
