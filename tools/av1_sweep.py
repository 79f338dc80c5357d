"""Randomized AV1 conformance sweep vs dav1d: sizes x content kinds
x quality x encoder speed x subsampling, full in-loop filters,
bit-exact assertion.  Catches setting-specific bugs the fixed test
matrix misses (e.g. the sub-8x8 BlockDecoded reset-scope bug was
speed-1/2-only).  Run: python tools/av1_sweep.py  (~5 min, 80 cfgs)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np, tempfile, pathlib, itertools
from PIL import Image
from tools.dav1d_oracle import decode_obus, avif_item_obus
from ffpic_tpu.formats.av1_recon import decode_frame

def img_for(w, h, seed, kind):
    rng = np.random.default_rng(seed)
    if kind == 'grad':
        x = np.linspace(0, 255, w); y = np.linspace(0, 255, h)
        g = (x[None,:] + y[:,None]) / 2
        im = np.stack([g, g[::-1], np.abs(g-128)*2], -1).astype(np.uint8)
        im += rng.integers(0, 25, im.shape, dtype=np.uint8)
    elif kind == 'noise':
        im = rng.integers(0, 256, (h, w, 3), np.uint8)
    elif kind == 'screen':
        # few flat colors + text-like rects: aom auto-enables
        # screen-content tools -> palette blocks (python symbol path)
        im = np.zeros((h, w, 3), np.uint8)
        cols = rng.integers(0, 256, (5, 3))
        sw = max(1, w // 5)
        for i in range(5):
            im[:, i*sw:(i+1)*sw] = cols[i]
        for _ in range(12):
            x0 = int(rng.integers(0, max(1, w-16)))
            y0 = int(rng.integers(0, max(1, h-8)))
            im[y0:y0+int(rng.integers(2,8)),
               x0:x0+int(rng.integers(4,16))] = rng.integers(0,256,3)
    else:  # flat+edges
        im = np.zeros((h, w, 3), np.uint8)
        im[:, :w//2] = (200, 30, 90)
        im[h//3:, w//3:] = (10, 220, 180)
        im += rng.integers(0, 8, im.shape, dtype=np.uint8)
    return im

fails = 0
n = 0
cfgs = []
for (w, h), kind, q, speed, sub in itertools.product(
        [(128,128), (200,136), (96,64), (256,192), (384,320)],
        ['grad', 'noise', 'edges', 'screen'],
        [35, 60, 85, 100], [0, 1, 2, 4, 6],
        ['4:2:0', '4:4:4', '4:2:2']):
    cfgs.append(((w,h), kind, q, speed, sub))
rng = np.random.default_rng(12345)
sel = [cfgs[i] for i in rng.choice(len(cfgs), 80, replace=False)]
with tempfile.TemporaryDirectory() as td:
    for (w, h), kind, q, speed, sub in sel:
        im = img_for(w, h, (q*7+speed) & 0xFF, kind)
        fn = pathlib.Path(td) / 'x.avif'
        try:
            Image.fromarray(im).save(fn, quality=q, speed=speed, subsampling=sub)
        except Exception as e:
            continue
        obus = avif_item_obus(fn.read_bytes())
        try:
            ref, _ = decode_obus(obus, inloop_filters=7)
            ours, _ = decode_frame(obus, apply_filters=True)
            bad = sum(int((a.astype(np.int64)!=b.astype(np.int64)).sum())
                      for a, b in zip(ours, ref))
        except Exception as e:
            bad = -1
            err = repr(e)[:120]
        n += 1
        if bad != 0:
            fails += 1
            print(f'FAIL {w}x{h} {kind} q{q} s{speed} {sub}: '
                  f'{"EXC " + err if bad < 0 else f"{bad} px"}', flush=True)
print(f'sweep: {n} configs, {fails} failures')

# ---- inter sweep: multi-frame streams via the libaom ctypes encoder
# (round-4 conformance: temporal mvs, compound, warp, grain,
# superres stills).  Round 5: deep-GOP configs (lag 19-25, libaom's
# default range) are INCLUDED — the round-4 desync was root-caused
# to a mis-transcribed Compound_Mode_Ctx_Map (av1_inter.py) and
# fixed; tests/test_av1_inter.py pins the minimal repro.
from tools import aom_oracle as AO
from ffpic_tpu.formats.av1_recon import Av1Decoder

def yuv_frames(n, h, w, bd, seed, shift):
    rng = np.random.default_rng(seed)
    mx = (1 << bd) - 1
    base = np.clip(np.linspace(0, mx, w)[None, :] +
                   np.linspace(0, mx // 2, h)[:, None] +
                   rng.integers(0, max(2, mx // 10), (h, w)),
                   0, mx).astype(np.uint16)
    out = []
    for i in range(n):
        out.append([np.roll(base, shift * i, 1),
                    np.full(((h + 1) // 2, (w + 1) // 2), mx // 2,
                            np.uint16),
                    rng.integers(0, mx, ((h + 1) // 2, (w + 1) // 2))
                    .astype(np.uint16)])
    return out

inter_n = inter_fails = 0
if AO.available():
    icfgs = [
        (3, 64, 64, 8, 3, 0, 6),  (5, 48, 48, 8, 5, 5, 6),
        (4, 96, 128, 8, 7, 8, 8), (3, 64, 64, 10, 3, 0, 6),
        (2, 128, 96, 8, 4, 0, 4), (8, 32, 32, 8, 2, 8, 6),
        (4, 64, 96, 10, 5, 5, 8), (2, 70, 94, 8, 3, 0, 8),
        (5, 64, 64, 8, 7, 19, 6), (6, 96, 64, 8, 5, 25, 6),
        (5, 48, 80, 10, 7, 19, 8), (8, 64, 64, 8, 3, 22, 6),
    ]
    for (nf, h, w, bd, shift, lag, speed) in icfgs:
        try:
            obus = AO.encode_frames(
                yuv_frames(nf, h, w, bd, 11 + nf, shift),
                bit_depth=bd, speed=speed, lag=lag)
            refs = decode_obus(obus, all_frames=True)
            ours = Av1Decoder().decode_obus(obus)
            bad = 0 if len(ours) == len(refs) else -2
            if bad == 0:
                for (rp, _), (op, _) in zip(refs, ours):
                    bad += sum(int((a.astype(np.int64) !=
                                    b.astype(np.int64)).sum())
                               for a, b in zip(op, rp))
        except Exception as e:
            bad = -1
            err = repr(e)[:120]
        inter_n += 1
        if bad != 0:
            inter_fails += 1
            print(f'FAIL inter n{nf} {w}x{h} bd{bd} lag{lag} '
                  f's{speed}: '
                  f'{"EXC " + err if bad == -1 else f"{bad} px"}',
                  flush=True)
print(f'inter sweep: {inter_n} configs, {inter_fails} failures')


# ---- superres-inter sweep: scaled references on every inter block
# (round 5: parse gate + scaled convolve bit-exact; the encode helper
# with the rc_superres cfg pokes lives in tests/test_av1_grain.py)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sr_n = sr_fails = 0
if AO.available():
    from test_av1_grain import _encode as _sr_encode, \
        _frames as _sr_frames
    for (den, h, w, bd, lag, nf) in [(16, 64, 128, 8, 0, 4),
                                     (13, 96, 64, 8, 19, 5),
                                     (10, 64, 96, 10, 8, 4)]:
        try:
            obus = _sr_encode(_sr_frames(nf, h, w, bd, shift=5),
                              bd=bd, sr_den=den, lag=lag, speed=6)
            refs = decode_obus(obus, all_frames=True)
            ours = Av1Decoder().decode_obus(obus)
            bad = 0 if len(ours) == len(refs) else -2
            if bad == 0:
                for (rp, _), (op, _) in zip(refs, ours):
                    bad += sum(int((a.astype(np.int64) !=
                                    b.astype(np.int64)).sum())
                               for a, b in zip(op, rp))
        except Exception as e:
            bad = -1
            err = repr(e)[:120]
        sr_n += 1
        if bad != 0:
            sr_fails += 1
            print(f'FAIL sr-inter den{den} {w}x{h} bd{bd} lag{lag}: '
                  f'{"EXC " + err if bad == -1 else f"{bad} px"}',
                  flush=True)
print(f'superres-inter sweep: {sr_n} configs, {sr_fails} failures')
