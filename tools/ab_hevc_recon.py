"""Stable A/B timer for the native HEVC recon/syntax stages.

Captures the 48 tiles' syntax inputs + recon inputs from one 12MP
corpus HEIC decode, then times each native stage in isolation with
best-of-N over fixed buffers (the co-tenant noise on this box swings
single full decodes 20%+; per-stage best-of-N on pinned inputs is
reproducible to a few percent).

    JAX_PLATFORMS=cpu python tools/ab_hevc_recon.py [trials]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    import numpy as np
    from ffpic_tpu import native
    from ffpic_tpu.formats import registry

    data = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "corpus",
        "heic_12mp_grid.heic"), "rb").read()
    reg = registry.probe(data)

    recon_args = []
    syntax_args = []
    orig_recon = native.hevc_recon
    orig_slice = native.hevc_decode_slice

    def cap_recon(planes, bd, strong, ops, tu, levels, residuals=None):
        recon_args.append((tuple(p.copy() for p in planes), bd,
                           strong, ops.copy(), tu.copy(),
                           levels.copy()))
        return orig_recon(planes, bd, strong, ops, tu, levels,
                          residuals)

    def cap_slice(d, params, st, mp):
        syntax_args.append((d, list(params), st.copy(), mp.copy()))
        return orig_slice(d, params, st, mp)

    native.hevc_recon = cap_recon
    native.hevc_decode_slice = cap_slice
    reg.load(data)
    native.hevc_recon = orig_recon
    native.hevc_decode_slice = orig_slice

    def time_syntax():
        t0 = time.perf_counter()
        for d, params, st, mp in syntax_args:
            orig_slice(d, params, st, mp)
        return time.perf_counter() - t0

    def time_recon():
        t0 = time.perf_counter()
        for planes, bd, strong, ops, tu, lv in recon_args:
            orig_recon(tuple(p.copy() for p in planes), bd, strong,
                       ops, tu, lv)
        return time.perf_counter() - t0

    # plane copies cost is part of time_recon; report it for subtraction
    def time_copy():
        t0 = time.perf_counter()
        for planes, _, _, _, _, _ in recon_args:
            tuple(p.copy() for p in planes)
        return time.perf_counter() - t0

    for name, fn in (("syntax", time_syntax), ("recon+copy", time_recon),
                     ("copy", time_copy)):
        best = min(fn() for _ in range(trials))
        print(f"{name:11s} {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
