"""Stage breakdown for the 12MP corpus HEIC decode (host path).

Wraps the native entry points with timers to split CABAC syntax /
recon / color / misc — the measurement behind the HEIC perf work
(PARITY.md round-3 HEIC row).  Run on an otherwise-idle host:

    JAX_PLATFORMS=cpu python tools/profile_heic.py [N_ITERS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import numpy as np
    from ffpic_tpu import native
    from ffpic_tpu.formats import registry

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "corpus", "heic_12mp_grid.heic")
    data = open(path, "rb").read()
    ops = registry.probe(data)

    acc = {"syntax": 0.0, "recon": 0.0, "color": 0.0}
    calls = {"syntax": 0, "recon": 0, "color": 0}

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            acc[name] += time.perf_counter() - t0
            calls[name] += 1
            return r
        return inner

    orig = (native.hevc_decode_slice, native.hevc_recon,
            native.hevc_color)
    native.hevc_decode_slice = wrap("syntax", native.hevc_decode_slice)
    native.hevc_recon = wrap("recon", native.hevc_recon)
    native.hevc_color = wrap("color", native.hevc_color)

    pic = ops.load(data)          # warm
    p = pic[0] if isinstance(pic, list) else pic
    h, w = np.asarray(p.pixels).shape[:2]
    mp = h * w / 1e6

    best = float("inf")
    for _ in range(iters):
        for k in acc:
            acc[k] = 0.0
            calls[k] = 0
        t0 = time.perf_counter()
        ops.load(data)
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            snap = dict(acc), dict(calls)
    (native.hevc_decode_slice, native.hevc_recon,
     native.hevc_color) = orig

    a, c = snap
    other = best - sum(a.values())
    print(f"total   {best*1e3:8.1f} ms   {mp/best:6.1f} MP/s  ({mp:.1f} MP)")
    for k in ("syntax", "recon", "color"):
        print(f"{k:7s} {a[k]*1e3:8.1f} ms   {100*a[k]/best:5.1f}%"
              f"   ({c[k]} calls)")
    print(f"other   {other*1e3:8.1f} ms   {100*other/best:5.1f}%")


if __name__ == "__main__":
    main()
