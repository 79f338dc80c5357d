"""Benchmark: 1080p baseline JPEG decode on one TPU chip.

Prints ONE JSON line:
  metric/value/unit/vs_baseline  — end-to-end decode MP/s per chip
  (host entropy + device dequant|IDCT|upsample|color), against the
  BASELINE.json north star of 2000 MP/s.
Extra keys report the stage breakdown the measurement plan in
BASELINE.md calls for (host-entropy MP/s, device-kernel MP/s,
host->HBM GB/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H, W = 1088, 1920          # MCU-aligned 1080p-class frame
BATCH = 8
ITERS = 20
BASELINE_MPS = 2000.0


def ensure_jpeg(path: str) -> None:
    if os.path.exists(path):
        return
    import numpy as np
    from PIL import Image
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from make_corpus import synth_rgb
    Image.fromarray(synth_rgb(H, W, seed=42)).save(
        path, "JPEG", quality=85, subsampling="4:2:0")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    if os.environ.get("FFPIC_TRACE"):
        from ffpic_tpu.utils import trace
        trace.enable()

    path = "/tmp/ffpic_bench_1080p.jpg"
    ensure_jpeg(path)
    with open(path, "rb") as f:
        data = f.read()

    from ffpic_tpu.formats import jpg
    from ffpic_tpu.ops.jpeg_kernels import decode_batch_420

    def best_of(fn, trials=3):
        """Best wall-clock of N trials: the machine shares a noisy
        tunnel + 1 vCPU with other tenants, and the minimum is the
        standard low-variance estimator for that regime (observed up
        to 8x swing on the device stage between identical runs —
        PARITY.md 'measurement variance')."""
        best = float("inf")
        for _ in range(trials):
            best = min(best, fn())
        return best

    def _anchor(arr):
        """Force true completion: on the axon tunnel backend,
        block_until_ready was observed returning before long kernels
        finish (PARITY.md measurement addendum) — fetching one element
        is the reliable completion barrier."""
        import numpy as _np
        a = arr
        while hasattr(a, "ndim") and a.ndim > 0:
            a = a[0]
        _np.asarray(a)

    # ---- host entropy stage ------------------------------------------
    j, _ = jpg.parse_and_decode(data)          # warm (also builds tables)
    n_host = 6
    mp = H * W / 1e6

    def host_trial():
        t0 = time.perf_counter()
        for _ in range(n_host):
            jpg.parse_and_decode(data)
        return (time.perf_counter() - t0) / n_host
    host_mps = mp / best_of(host_trial)

    # packed-emission host stage (the production fast path)
    jp_, _ = jpg.parse_and_decode(data, packed=True)

    def host_packed_trial():
        t0 = time.perf_counter()
        for _ in range(n_host):
            jpg.parse_and_decode(data, packed=True)
        return (time.perf_counter() - t0) / n_host
    host_packed_mps = mp / best_of(host_packed_trial)

    # ---- device pipeline stage ---------------------------------------
    assert j.coeffs_raster, "native decoder required for bench"
    yc = j.coeffs[0].reshape(j.comps[0].nby, j.comps[0].nbx, 8, 8)
    uc = j.coeffs[1].reshape(j.comps[1].nby, j.comps[1].nbx, 8, 8)
    vc = j.coeffs[2].reshape(j.comps[2].nby, j.comps[2].nbx, 8, 8)
    yq = j.dqt[j.comps[0].tq].reshape(8, 8)
    cq = j.dqt[j.comps[1].tq].reshape(8, 8)

    yq_d = jnp.asarray(yq)
    cq_d = jnp.asarray(cq)

    # ---- end-to-end FIRST (fresh device queue): measured pipelined
    # loop — packed host entropy emission -> ~2.4x-smaller staging
    # fused into ONE uint8 transfer per frame -> fused
    # unpack|dequant|IDCT|upsample|color launch per frame
    from ffpic_tpu.ops.jpeg_kernels import (
        decode_frame_420_packed_fused, fuse_packed)
    jp, _ = jpg.parse_and_decode(data, packed=True)
    shapes = tuple((c.nby, c.nbx) for c in jp.comps)
    bmap = jpg.packed_block_map(jp)
    cnts, kss, vls, _nnz = jp.packed
    G, E = len(cnts), len(kss)
    warm = decode_frame_420_packed_fused(
        jnp.asarray(fuse_packed(cnts, kss, vls)), bmap, yq_d, cq_d,
        G, E, shapes)
    warm.block_until_ready()
    del warm
    K = 12

    def e2e_trial():
        t0 = time.perf_counter()
        outs = []
        for _ in range(K):
            jj, _ = jpg.parse_and_decode(data, packed=True)
            c_, k_, v_, _n = jj.packed
            outs.append(decode_frame_420_packed_fused(
                jnp.asarray(fuse_packed(c_, k_, v_)), bmap, yq_d,
                cq_d, len(c_), len(k_), shapes))
        jax.block_until_ready(outs)
        _anchor(outs[-1])
        return (time.perf_counter() - t0) / K
    e2e_mps = mp / best_of(e2e_trial)

    # ---- e2e batched (production decode_batch shape): K frames' host
    # entropy + ONE stacked staging transfer + ONE fused launch ------
    from ffpic_tpu.ops.jpeg_kernels import (decode_batch_420_packed,
                                            stack_packed)
    KB = 8

    def parse_all():
        out = []
        for _ in range(KB):
            jj, _ = jpg.parse_and_decode(data, packed=True)
            c_, k_, v_, nnz_ = jj.packed
            out.append((np.array(c_), np.array(k_), np.array(v_),
                        nnz_))
        return out, jj

    plist, jlast = parse_all()
    cts, kss2, vls2 = stack_packed(plist)
    yqs = jnp.asarray(np.broadcast_to(yq, (KB, 1, 1, 8, 8)))
    cqs = jnp.asarray(np.broadcast_to(cq, (KB, 1, 1, 8, 8)))
    warmb = decode_batch_420_packed(
        jnp.asarray(cts), jnp.asarray(kss2), jnp.asarray(vls2), bmap,
        yqs, cqs, shapes)
    warmb.block_until_ready()
    del warmb

    def e2e_batch_trial():
        t0 = time.perf_counter()
        pl, _ = parse_all()
        c_, k_, v_ = stack_packed(pl)
        out = decode_batch_420_packed(
            jnp.asarray(c_), jnp.asarray(k_), jnp.asarray(v_), bmap,
            yqs, cqs, shapes)
        out.block_until_ready()
        _anchor(out)
        return time.perf_counter() - t0
    e2e_batch_mps = KB * mp / best_of(e2e_batch_trial)

    # ---- device pipeline stage (batched) -----------------------------
    ycb = np.broadcast_to(yc, (BATCH, *yc.shape)).copy()
    ucb = np.broadcast_to(uc, (BATCH, *uc.shape)).copy()
    vcb = np.broadcast_to(vc, (BATCH, *vc.shape)).copy()

    ycb_d = jnp.asarray(ycb)
    ucb_d = jnp.asarray(ucb)
    vcb_d = jnp.asarray(vcb)

    out = decode_batch_420(ycb_d, ucb_d, vcb_d, yq_d, cq_d)  # warm/compile
    out.block_until_ready()

    def dev_trial():
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = decode_batch_420(ycb_d, ucb_d, vcb_d, yq_d, cq_d)
        o.block_until_ready()
        _anchor(o)
        return (time.perf_counter() - t0) / ITERS
    dev_mps = BATCH * mp / best_of(dev_trial)

    # ---- host->HBM staging -------------------------------------------
    nbytes = ycb.nbytes + ucb.nbytes + vcb.nbytes
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.device_put((ycb, ucb, vcb)))
    h2d_dt = (time.perf_counter() - t0) / 5
    h2d_gbps = nbytes / h2d_dt / 1e9

    # ---- WebP e2e (config 3): host entropy + native loop filter +
    # device residual/color path -------------------------------------
    webp_mps = None
    wp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "webp_512.webp")
    if os.path.exists(wp):
        import ffpic_tpu
        with open(wp, "rb") as f:
            wdata = f.read()
        jax.block_until_ready(ffpic_tpu.load(wdata).pixels)   # warm

        def webp_trial():
            t0 = time.perf_counter()
            outs = [ffpic_tpu.load(wdata).pixels for _ in range(5)]
            jax.block_until_ready(outs)
            _anchor(outs[-1])
            return (time.perf_counter() - t0) / 5
        webp_mps = 512 * 512 / 1e6 / best_of(webp_trial)

    # ---- device-side entropy decode (VERDICT r2 #1 experiment): the
    # same 1080p frame written with restart markers per MCU row (68
    # exact entropy split points); host ships raw destuffed bytes,
    # the TPU decodes Huffman + dequant|IDCT|color in-device --------
    dev_ent_mps = None
    if jax.default_backend() == "tpu":
        try:
            from ffpic_tpu.ops.jpeg_entropy_device import \
                decode_batch_device_entropy
            from PIL import Image
            dpath = "/tmp/ffpic_bench_1080p_dri.jpg"
            if not os.path.exists(dpath):
                Image.open(path).save(dpath, "JPEG", quality=85,
                                      subsampling="4:2:0",
                                      restart_marker_rows=1)
            with open(dpath, "rb") as f:
                ddata = f.read()
            datas = [ddata] * BATCH
            jax.block_until_ready(
                decode_batch_device_entropy(datas, unroll=64))

            def dev_ent_trial():
                t0 = time.perf_counter()
                r = decode_batch_device_entropy(datas, unroll=64)
                jax.block_until_ready(r)
                _anchor(r)
                return time.perf_counter() - t0
            dev_ent_mps = BATCH * mp / best_of(dev_ent_trial)
        except Exception:
            dev_ent_mps = None

    # ---- hybrid pipeline (production decode_batch): the all-DRI batch
    # splits between the device entropy engine (async dispatch) and
    # the host packed path, so both decode CONCURRENTLY and the batch
    # lands at max(host, device) instead of either alone ------------
    hyb_mps = None
    if jax.default_backend() == "tpu" and dev_ent_mps:
        try:
            from ffpic_tpu.pipeline import decode_batch as _db
            datas_h = [ddata] * BATCH
            jax.block_until_ready(_db(datas_h))        # warm/compile

            def hyb_trial():
                t0 = time.perf_counter()
                r = _db(datas_h)
                r.block_until_ready()
                _anchor(r)
                return time.perf_counter() - t0
            hyb_mps = BATCH * mp / best_of(hyb_trial)
        except Exception:
            hyb_mps = None

    # ---- speculative device entropy (DRI-less): the SAME plain bench
    # stream (no restart markers) decoded fully on-device via the
    # self-sync chunk decoder (pass-1 scan + device-side fixpoint +
    # emission in one launch) --------------------------------------
    dev_spec_mps = None
    if jax.default_backend() == "tpu":
        try:
            from ffpic_tpu.ops.jpeg_entropy_device import \
                decode_batch_device_entropy_spec
            datas_p = [data] * BATCH
            jax.block_until_ready(
                decode_batch_device_entropy_spec(datas_p,
                                                 chunk_bytes=4096))

            def dev_spec_trial():
                t0 = time.perf_counter()
                r = decode_batch_device_entropy_spec(datas_p,
                                                     chunk_bytes=4096)
                jax.block_until_ready(r)
                _anchor(r)
                return time.perf_counter() - t0
            dev_spec_mps = BATCH * mp / best_of(dev_spec_trial)
        except Exception:
            dev_spec_mps = None

    # ---- HEIC e2e (config 4): host CABAC syntax + recon (C) + C color
    # -- the 12MP iPhone-style grid from the corpus ---------------------
    heic_mps = None
    hp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "heic_12mp_grid.heic")
    if os.path.exists(hp):
        import ffpic_tpu
        with open(hp, "rb") as f:
            hdata = f.read()
        hpic = ffpic_tpu.load(hdata)                      # warm
        hmp = (hpic.np_pixels().shape[0]
               * hpic.np_pixels().shape[1]) / 1e6

        def heic_trial():
            t0 = time.perf_counter()
            ffpic_tpu.load(hdata)
            return time.perf_counter() - t0
        heic_mps = hmp / best_of(heic_trial)

    # ---- AVIF e2e: AV1 intra decode (Python tile syntax + C
    # coefficient loops + vectorized transforms/filters) -------------
    avif_mps = None
    ap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "avif_512.avif")
    if os.path.exists(ap):
        import ffpic_tpu
        with open(ap, "rb") as f:
            adata = f.read()
        apic = ffpic_tpu.load(adata)                      # warm
        amp = (apic.np_pixels().shape[0]
               * apic.np_pixels().shape[1]) / 1e6

        def avif_trial():
            t0 = time.perf_counter()
            ffpic_tpu.load(adata)
            return time.perf_counter() - t0
        avif_mps = amp / best_of(avif_trial)

    # Headline = best production JPEG path this run.  Both are
    # production-wired (pipeline.decode_batch routes eligible DRI
    # groups through device entropy, everything else through packed
    # host entropy); which one wins depends on tunnel weather — the
    # device path ships ~4x fewer bytes and dominates when staging is
    # the bottleneck, the host path wins when the tunnel is quiet and
    # the 1-vCPU host is free.
    candidates = {"host_packed": e2e_mps,
                  "device_entropy_dri": dev_ent_mps or 0,
                  "hybrid_pipeline": hyb_mps or 0,
                  "device_entropy_spec": dev_spec_mps or 0}
    best_path = max(candidates, key=lambda k: candidates[k])
    best_mps = candidates[best_path]
    result = {
        "metric": "jpeg_1080p_420_decode_end_to_end",
        "value": round(best_mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(best_mps / BASELINE_MPS, 4),
        "e2e_best_path": best_path,
        "e2e_packed_mps": round(e2e_mps, 1),
        "host_entropy_mps": round(host_mps, 1),
        "host_entropy_packed_mps": round(host_packed_mps, 1),
        "e2e_batch_mps": round(e2e_batch_mps, 1),
        "webp_512_mps": round(webp_mps, 2) if webp_mps else None,
        "heic_12mp_mps": round(heic_mps, 2) if heic_mps else None,
        "avif_512_mps": round(avif_mps, 2) if avif_mps else None,
        "device_entropy_dri_mps": (round(dev_ent_mps, 1)
                                   if dev_ent_mps else None),
        "hybrid_pipeline_mps": round(hyb_mps, 1) if hyb_mps else None,
        "device_entropy_spec_mps": (round(dev_spec_mps, 1)
                                    if dev_spec_mps else None),
        "device_pipeline_mps": round(dev_mps, 1),
        "host_to_hbm_gbps": round(h2d_gbps, 2),
        "batch": BATCH,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    if os.environ.get("FFPIC_TRACE"):
        from ffpic_tpu.utils import trace
        rep = {k: {kk: round(vv, 5) for kk, vv in d.items()}
               for k, d in trace.report().items()}
        print("trace:", json.dumps(rep), file=sys.stderr)


if __name__ == "__main__":
    main()
