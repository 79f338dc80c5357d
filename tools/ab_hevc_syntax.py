"""Same-moment A/B for host_hevc.c syntax OR recon variants.

Co-tenant noise on this box swings identical-build cycle counts 25%
between runs minutes apart, so sequential measurement cannot resolve
<20% effects.  This harness compiles TWO source variants to /tmp,
captures the 48 tiles' stage inputs once, then interleaves A/B trial
pairs so both variants see the same noise window.

    JAX_PLATFORMS=cpu python tools/ab_hevc_syntax.py A.c B.c [pairs] [recon]
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
    stage = sys.argv[4] if len(sys.argv) > 4 else "syntax"
    lib_a, lib_b = build(src_a), build(src_b)

    data = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "corpus",
        "heic_12mp_grid.heic"), "rb").read()
    reg = registry.probe(data)
    syntax_args = []
    recon_args = []
    orig = native.hevc_decode_slice
    orig_recon = native.hevc_recon

    def cap(d, params, st, mp):
        syntax_args.append((np.frombuffer(d, np.uint8), len(d),
                            np.ascontiguousarray(params, np.int32),
                            np.ascontiguousarray(st, np.uint8),
                            np.ascontiguousarray(mp, np.uint8)))
        return orig(d, params, st, mp)

    def cap_recon(planes, bd, strong, ops_, tu, levels,
                  residuals=None):
        recon_args.append((tuple(p.copy() for p in planes), bd,
                           strong,
                           np.ascontiguousarray(ops_, np.int32),
                           np.ascontiguousarray(tu, np.int32),
                           np.ascontiguousarray(levels, np.int16)))
        return orig_recon(planes, bd, strong, ops_, tu, levels,
                          residuals)
    native.hevc_decode_slice = cap
    native.hevc_recon = cap_recon
    reg.load(data)
    native.hevc_decode_slice = orig
    native.hevc_recon = orig_recon

    if stage == "recon":
        vp = lambda a: a.ctypes.data_as(ctypes.c_void_p)

        def run_recon(lib):
            fn = lib.ffpic_hevc_recon2
            fn.restype = ctypes.c_int
            t0 = time.perf_counter()
            for planes, bd, strong, ops_, tu, lv in recon_args:
                Y, U, V = planes[0], planes[1], planes[2]
                r = fn(vp(Y), vp(U), vp(V),
                       ctypes.c_int(Y.shape[1]),
                       ctypes.c_int(Y.shape[0]),
                       ctypes.c_int(U.shape[1]),
                       ctypes.c_int(U.shape[0]),
                       ctypes.c_int(len(planes)), ctypes.c_int(bd),
                       ctypes.c_int(1 if strong else 0),
                       vp(ops_), ctypes.c_long(len(ops_)),
                       vp(tu), ctypes.c_long(len(tu)), vp(lv), None)
                assert r == 0, r
            return time.perf_counter() - t0

        run_recon(lib_a)
        run_recon(lib_b)
        # cross-check outputs once
        outs = []
        for lib in (lib_a, lib_b):
            snap = []
            for planes, bd, strong, ops_, tu, lv in recon_args:
                cp = tuple(p.copy() for p in planes)
                fn = lib.ffpic_hevc_recon2
                fn.restype = ctypes.c_int
                Y, U, V = cp
                fn(vp(Y), vp(U), vp(V), ctypes.c_int(Y.shape[1]),
                   ctypes.c_int(Y.shape[0]), ctypes.c_int(U.shape[1]),
                   ctypes.c_int(U.shape[0]), ctypes.c_int(3),
                   ctypes.c_int(bd), ctypes.c_int(1 if strong else 0),
                   vp(ops_), ctypes.c_long(len(ops_)), vp(tu),
                   ctypes.c_long(len(tu)), vp(lv), None)
                snap.append(cp)
            outs.append(snap)
        if not os.environ.get("AB_NOCHECK"):
            for sa, sb in zip(*outs):
                for pa, pb in zip(sa, sb):
                    assert np.array_equal(pa, pb), "A/B outputs differ!"
        best_a = best_b = float("inf")
        ratios = []
        for _ in range(pairs):
            a = run_recon(lib_a)
            b = run_recon(lib_b)
            best_a = min(best_a, a)
            best_b = min(best_b, b)
            ratios.append(b / a)
        ratios.sort()
        print(f"recon A min {best_a*1e3:7.1f} ms   B min "
              f"{best_b*1e3:7.1f} ms   B/A min-ratio "
              f"{best_b/best_a:.3f}  median-pair-ratio "
              f"{ratios[len(ratios)//2]:.3f}")
        return

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
