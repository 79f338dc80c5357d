"""Same-moment A/B for host_hevc.c syntax variants.

Co-tenant noise on this box swings identical-build cycle counts 25%
between runs minutes apart, so sequential measurement cannot resolve
<20% effects.  This harness compiles TWO source variants to /tmp,
captures the 48 tiles' syntax inputs once, then interleaves A/B trial
pairs so both variants see the same noise window.

    JAX_PLATFORMS=cpu python tools/ab_hevc_syntax.py A.c B.c [pairs]
"""

import ctypes
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(src: str) -> ctypes.CDLL:
    so = f"/tmp/ab_hevc_{os.path.basename(src)}_{abs(hash(src)) % 99999}.so"
    subprocess.run(["cc", "-O3", "-march=native", "-fPIC", "-shared",
                    "-fvisibility=hidden", "-o", so, src], check=True)
    return ctypes.CDLL(so)


def main():
    import numpy as np
    from ffpic_tpu import native
    from ffpic_tpu.formats import registry

    src_a, src_b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    lib_a, lib_b = build(src_a), build(src_b)

    data = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "corpus",
        "heic_12mp_grid.heic"), "rb").read()
    reg = registry.probe(data)
    syntax_args = []
    orig = native.hevc_decode_slice

    def cap(d, params, st, mp):
        syntax_args.append((np.frombuffer(d, np.uint8), len(d),
                            np.ascontiguousarray(params, np.int32),
                            np.ascontiguousarray(st, np.uint8),
                            np.ascontiguousarray(mp, np.uint8)))
        return orig(d, params, st, mp)
    native.hevc_decode_slice = cap
    reg.load(data)
    native.hevc_decode_slice = orig

    # scratch buffers sized like the wrapper's
    w, h, ctb_log2 = (int(syntax_args[0][2][0]),
                      int(syntax_args[0][2][1]),
                      int(syntax_args[0][2][2]))
    mw, mh = (w + 3) // 4, (h + 3) // 4
    ctbs = (((w + (1 << ctb_log2) - 1) >> ctb_log2)
            * ((h + (1 << ctb_log2) - 1) >> ctb_log2))
    n44 = mw * mh
    ops = np.empty((3 * n44 + 64, 6), np.int32)
    tu_meta = np.empty((3 * n44 + 64, 8), np.int32)
    levels = np.empty(2 * w * h + 4096, np.int16)
    sao = np.zeros((ctbs, 21), np.int32)
    ct_depth = np.empty(n44, np.int8)
    luma_mode = np.empty(n44, np.int8)
    qp_map = np.empty(n44, np.int8)
    bypass_map = np.empty(n44, np.uint8)
    n_tus = np.zeros(1, np.int64)
    vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)

    def run(lib):
        fn = lib.ffpic_hevc_decode_slice
        fn.restype = ctypes.c_long
        t0 = time.perf_counter()
        for buf, ln, prm, st, mp in syntax_args:
            r = fn(vp(buf), ctypes.c_long(ln), vp(prm), vp(st), vp(mp),
                   vp(ops), ctypes.c_long(len(ops)), vp(tu_meta),
                   ctypes.c_long(len(tu_meta)), vp(levels),
                   ctypes.c_long(len(levels)), vp(sao), vp(ct_depth),
                   vp(luma_mode), vp(qp_map), vp(bypass_map),
                   vp(n_tus))
            assert r >= 0, r
        return time.perf_counter() - t0

    run(lib_a)
    run(lib_b)      # warm both
    best_a = best_b = float("inf")
    ratios = []
    for _ in range(pairs):
        a = run(lib_a)
        b = run(lib_b)
        best_a = min(best_a, a)
        best_b = min(best_b, b)
        ratios.append(b / a)
    ratios.sort()
    print(f"A min {best_a*1e3:7.1f} ms   B min {best_b*1e3:7.1f} ms   "
          f"B/A min-ratio {best_b/best_a:.3f}  median-pair-ratio "
          f"{ratios[len(ratios)//2]:.3f}")


if __name__ == "__main__":
    main()
