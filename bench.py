"""Benchmark: 1080p baseline JPEG decode on one TPU chip.

Prints ONE JSON line:
  metric/value/unit/vs_baseline  — end-to-end decode MP/s per chip
  (host entropy + device dequant|IDCT|upsample|color), against the
  BASELINE.json north star of 2000 MP/s.
Extra keys report the stage breakdown the measurement plan in
BASELINE.md calls for (host-entropy MP/s, device-kernel MP/s,
host->HBM GB/s).

Measurement robustness (round-4 redesign): the axon tunnel this box
reaches the TPU through is shared and its effective bandwidth swings
0.08-1.5 GB/s between MINUTES (observed 63 ms <-> 1789 ms for the
same launch; PARITY.md "measurement variance").  Back-to-back
best-of-3 therefore samples ONE weather phase and can record a 4-8x
pessimistic number for code that didn't change (r2 148.8 -> r3 35.7
MP/s was exactly this).  The fix: every metric is a registered trial
closure, and a scheduler runs ALL of them round-robin across
FFPIC_BENCH_ROUNDS (default 6) rounds separated by
FFPIC_BENCH_SLEEP (default 12 s) sleeps, taking the per-metric
minimum across rounds — so the sweep spans several minutes and each
metric gets a sample in every weather phase.  Each round also probes
the tunnel with a fixed 24 MB host->HBM transfer and the per-round
GB/s list is emitted as `tunnel_gbps_per_round`, so a capture taken
entirely inside a bad burst is self-explaining in the JSON.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.time()


def _log(msg: str) -> None:
    """Stage progress to stderr so a slow/stuck run is diagnosable
    from the driver's captured log (tunnel weather can stretch any
    warm-up compile to minutes)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)

H, W = 1088, 1920          # MCU-aligned 1080p-class frame
BATCH = 8
ITERS = 20
BASELINE_MPS = 2000.0
ROUNDS = int(os.environ.get("FFPIC_BENCH_ROUNDS", "6"))
SLEEP = float(os.environ.get("FFPIC_BENCH_SLEEP", "12"))


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

    # trial registry: name -> (fn returning seconds, mp_per_call)
    trials = {}

    def register(name, fn, mp_per_call):
        trials[name] = (fn, mp_per_call)

    mp = H * W / 1e6

    # ---- host entropy stage ------------------------------------------
    _log("warming host entropy")
    j, _ = jpg.parse_and_decode(data)          # warm (also builds tables)
    n_host = 6

    def host_trial():
        t0 = time.perf_counter()
        for _ in range(n_host):
            jpg.parse_and_decode(data)
        return (time.perf_counter() - t0) / n_host
    register("host_entropy", host_trial, mp)

    # packed-emission host stage (the production fast path)
    jp_, _ = jpg.parse_and_decode(data, packed=True)

    def host_packed_trial():
        t0 = time.perf_counter()
        for _ in range(n_host):
            jpg.parse_and_decode(data, packed=True)
        return (time.perf_counter() - t0) / n_host
    register("host_entropy_packed", host_packed_trial, mp)

    # ---- device pipeline stage ---------------------------------------
    assert j.coeffs_raster, "native decoder required for bench"
    yc = j.coeffs[0].reshape(j.comps[0].nby, j.comps[0].nbx, 8, 8)
    uc = j.coeffs[1].reshape(j.comps[1].nby, j.comps[1].nbx, 8, 8)
    vc = j.coeffs[2].reshape(j.comps[2].nby, j.comps[2].nbx, 8, 8)
    yq = j.dqt[j.comps[0].tq].reshape(8, 8)
    cq = j.dqt[j.comps[1].tq].reshape(8, 8)

    yq_d = jnp.asarray(yq)
    cq_d = jnp.asarray(cq)

    # ---- end-to-end: measured pipelined loop — packed host entropy
    # emission -> ~2.4x-smaller staging fused into ONE uint8 transfer
    # per frame -> fused unpack|dequant|IDCT|upsample|color launch per
    # frame
    from ffpic_tpu.ops.jpeg_kernels import (
        decode_frame_420_packed_fused, fuse_packed)
    jp, _ = jpg.parse_and_decode(data, packed=True)
    shapes = tuple((c.nby, c.nbx) for c in jp.comps)
    bmap = jpg.packed_block_map(jp)
    cnts, kss, vls, _nnz = jp.packed
    G, E = len(cnts), len(kss)
    _log("warming e2e_packed (fused launch compile)")
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
    register("e2e_packed", e2e_trial, mp)

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
    _log("warming e2e_batch")
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
    register("e2e_batch", e2e_batch_trial, KB * mp)

    # ---- device pipeline stage (batched) -----------------------------
    ycb = np.broadcast_to(yc, (BATCH, *yc.shape)).copy()
    ucb = np.broadcast_to(uc, (BATCH, *uc.shape)).copy()
    vcb = np.broadcast_to(vc, (BATCH, *vc.shape)).copy()

    ycb_d = jnp.asarray(ycb)
    ucb_d = jnp.asarray(ucb)
    vcb_d = jnp.asarray(vcb)

    _log("warming device_pipeline")
    out = decode_batch_420(ycb_d, ucb_d, vcb_d, yq_d, cq_d)  # warm/compile
    out.block_until_ready()
    del out

    def dev_trial():
        t0 = time.perf_counter()
        o = None
        for _ in range(ITERS):
            o = decode_batch_420(ycb_d, ucb_d, vcb_d, yq_d, cq_d)
        o.block_until_ready()
        _anchor(o)
        return (time.perf_counter() - t0) / ITERS
    register("device_pipeline", dev_trial, BATCH * mp)

    # ---- host->HBM tunnel probe: fixed 24 MB transfer, run once per
    # scheduler round; the per-round GB/s series is emitted raw ------
    probe = np.frombuffer(os.urandom(24 << 20), dtype=np.uint8)

    def tunnel_probe():
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        return probe.nbytes / (time.perf_counter() - t0) / 1e9
    _log("warming tunnel probe")
    tunnel_probe()                                  # warm

    # ---- WebP e2e (config 3): host entropy + native loop filter +
    # device residual/color path -------------------------------------
    wp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "webp_512.webp")
    wdata = None
    if os.path.exists(wp):
        import ffpic_tpu
        with open(wp, "rb") as f:
            wdata = f.read()
        _log("warming webp_512")
        jax.block_until_ready(ffpic_tpu.load(wdata).pixels)   # warm

        def webp_trial():
            t0 = time.perf_counter()
            outs = [ffpic_tpu.load(wdata).pixels for _ in range(5)]
            jax.block_until_ready(outs)
            _anchor(outs[-1])
            return (time.perf_counter() - t0) / 5
        register("webp_512", webp_trial, 512 * 512 / 1e6)

    # ---- device-side entropy decode (VERDICT r2 #1 experiment): the
    # same 1080p frame written with restart markers per MCU row (68
    # exact entropy split points); host ships raw destuffed bytes,
    # the TPU decodes Huffman + dequant|IDCT|color in-device --------
    ddata = None
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
            _log("warming device_entropy_dri")
            jax.block_until_ready(
                decode_batch_device_entropy(datas, unroll=64))

            def dev_ent_trial():
                t0 = time.perf_counter()
                r = decode_batch_device_entropy(datas, unroll=64)
                jax.block_until_ready(r)
                _anchor(r)
                return time.perf_counter() - t0
            register("device_entropy_dri", dev_ent_trial, BATCH * mp)
        except Exception:
            ddata = None

    # ---- hybrid pipeline (production decode_batch): the all-DRI batch
    # splits between the device entropy engine (async dispatch) and
    # the host packed path, so both decode CONCURRENTLY and the batch
    # lands at max(host, device) instead of either alone ------------
    if jax.default_backend() == "tpu" and ddata is not None:
        try:
            from ffpic_tpu.pipeline import decode_batch as _db
            datas_h = [ddata] * BATCH
            _log("warming hybrid_pipeline")
            jax.block_until_ready(_db(datas_h))        # warm/compile

            def hyb_trial():
                t0 = time.perf_counter()
                r = _db(datas_h)
                r.block_until_ready()
                _anchor(r)
                return time.perf_counter() - t0
            register("hybrid_pipeline", hyb_trial, BATCH * mp)
        except Exception:
            pass

    # ---- speculative device entropy (DRI-less): the SAME plain bench
    # stream (no restart markers) decoded fully on-device via the
    # self-sync chunk decoder (pass-1 scan + device-side fixpoint +
    # emission in one launch) --------------------------------------
    if jax.default_backend() == "tpu":
        try:
            from ffpic_tpu.ops.jpeg_entropy_device import \
                decode_batch_device_entropy_spec
            datas_p = [data] * BATCH
            _log("warming device_entropy_spec")
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
            register("device_entropy_spec", dev_spec_trial, BATCH * mp)
        except Exception:
            pass

    # ---- HEIC e2e (config 4): host CABAC syntax + recon (C) + C color
    # -- the 12MP iPhone-style grid from the corpus ---------------------
    hp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "heic_12mp_grid.heic")
    hdata = None
    hmp = None
    if os.path.exists(hp):
        import ffpic_tpu
        with open(hp, "rb") as f:
            hdata = f.read()
        _log("warming heic_12mp")
        hpic = ffpic_tpu.load(hdata)                      # warm
        hmp = (hpic.np_pixels().shape[0]
               * hpic.np_pixels().shape[1]) / 1e6

        def heic_trial():
            t0 = time.perf_counter()
            ffpic_tpu.load(hdata)
            return time.perf_counter() - t0
        register("heic_12mp", heic_trial, hmp)

    # ---- gated device paths: measured by the DRIVER run so end-of-
    # round data (not interactive runs) decides the host/device
    # defaults (VERDICT r3 weak #5).  Env gates are read at decode
    # time, so each trial flips the gate around the call -------------
    def _gated(name, gate, dat):
        import ffpic_tpu

        def trial():
            os.environ[gate] = "1"
            try:
                t0 = time.perf_counter()
                p = ffpic_tpu.load(dat)
                jax.block_until_ready(p.pixels)
                _anchor(p.pixels)
                return time.perf_counter() - t0
            finally:
                os.environ.pop(gate, None)
        return trial

    if hdata is not None and jax.default_backend() == "tpu":
        try:
            _log("warming heic_device (gated)")
            t = _gated("heic_device", "FFPIC_HEVC_DEVICE", hdata)
            t()                                           # warm/compile
            register("heic_device", t, hmp)
        except Exception:
            os.environ.pop("FFPIC_HEVC_DEVICE", None)
    if wdata is not None and jax.default_backend() == "tpu":
        try:
            _log("warming webp_device (gated)")
            t = _gated("webp_device", "FFPIC_VP8_DEVICE", wdata)
            t()                                           # warm/compile
            register("webp_device", t, 512 * 512 / 1e6)
        except Exception:
            os.environ.pop("FFPIC_VP8_DEVICE", None)

    # ---- AVIF e2e: AV1 intra decode (Python tile syntax + C
    # coefficient loops + vectorized transforms/filters) -------------
    ap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "corpus", "avif_512.avif")
    if os.path.exists(ap):
        import ffpic_tpu
        with open(ap, "rb") as f:
            adata = f.read()
        _log("warming avif_512")
        apic = ffpic_tpu.load(adata)                      # warm
        amp = (apic.np_pixels().shape[0]
               * apic.np_pixels().shape[1]) / 1e6

        def avif_trial():
            t0 = time.perf_counter()
            ffpic_tpu.load(adata)
            return time.perf_counter() - t0
        register("avif_512", avif_trial, amp)

    # ---- scheduler: round-robin every registered trial across ROUNDS
    # rounds separated by SLEEP-second gaps, minimum per metric ------
    best = {n: float("inf") for n in trials}
    tunnel_rounds = []
    t_sweep0 = time.perf_counter()
    budget_s = float(os.environ.get("FFPIC_BENCH_BUDGET_S", "360"))
    _log(f"sweep start: {len(trials)} trials x {ROUNDS} rounds "
         f"(budget {budget_s:.0f}s)")
    for r in range(ROUNDS):
        try:
            tunnel_rounds.append(round(tunnel_probe(), 3))
        except Exception:
            tunnel_rounds.append(None)
        for n, (fn, _mp) in trials.items():
            try:
                best[n] = min(best[n], fn())
            except Exception:
                pass
        _log(f"round {r + 1}/{ROUNDS} done")
        # time budget: never let the sweep phase exceed budget_s —
        # at 0.03 GB/s tunnel weather a single round can take minutes
        # and the driver's run must still produce a JSON line
        if time.perf_counter() - t_sweep0 + SLEEP > budget_s:
            _log(f"budget reached after round {r + 1}; stopping sweep")
            break
        if r < ROUNDS - 1:
            time.sleep(SLEEP)
    sweep_s = time.perf_counter() - t_sweep0

    def mps(name):
        fn_mp = trials.get(name)
        if fn_mp is None or not (best[name] < float("inf")):
            return None
        return fn_mp[1] / best[name]

    # Headline = best production JPEG path this run.  Both are
    # production-wired (pipeline.decode_batch routes eligible DRI
    # groups through device entropy, everything else through packed
    # host entropy); which one wins depends on tunnel weather — the
    # device path ships ~4x fewer bytes and dominates when staging is
    # the bottleneck, the host path wins when the tunnel is quiet and
    # the 1-vCPU host is free.
    candidates = {"host_packed": mps("e2e_packed") or 0,
                  "device_entropy_dri": mps("device_entropy_dri") or 0,
                  "hybrid_pipeline": mps("hybrid_pipeline") or 0,
                  "device_entropy_spec": mps("device_entropy_spec") or 0}
    best_path = max(candidates, key=lambda k: candidates[k])
    best_mps = candidates[best_path]

    def rnd(v, d=1):
        return round(v, d) if v is not None else None

    result = {
        "metric": "jpeg_1080p_420_decode_end_to_end",
        "value": round(best_mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(best_mps / BASELINE_MPS, 4),
        "e2e_best_path": best_path,
        "e2e_packed_mps": rnd(mps("e2e_packed")),
        "host_entropy_mps": rnd(mps("host_entropy")),
        "host_entropy_packed_mps": rnd(mps("host_entropy_packed")),
        "e2e_batch_mps": rnd(mps("e2e_batch")),
        "webp_512_mps": rnd(mps("webp_512"), 2),
        "heic_12mp_mps": rnd(mps("heic_12mp"), 2),
        "avif_512_mps": rnd(mps("avif_512"), 2),
        "heic_device_mps": rnd(mps("heic_device"), 2),
        "webp_device_mps": rnd(mps("webp_device"), 2),
        "device_entropy_dri_mps": rnd(mps("device_entropy_dri")),
        "hybrid_pipeline_mps": rnd(mps("hybrid_pipeline")),
        "device_entropy_spec_mps": rnd(mps("device_entropy_spec")),
        "device_pipeline_mps": rnd(mps("device_pipeline")),
        "host_to_hbm_gbps": (max(t for t in tunnel_rounds if t)
                             if any(tunnel_rounds) else None),
        "tunnel_gbps_per_round": tunnel_rounds,
        "bench_rounds": ROUNDS,
        "bench_sweep_s": round(sweep_s, 1),
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
