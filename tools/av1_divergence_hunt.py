"""Localize an entropy-decode divergence against dav1d.

Instruments TileDecoder's msac reads with a global counter.  Pass 1
logs every read (call-site line, cdf size, value).  Pass 2 replays the
decode, substituting at one read index K an alternative CDF cell
(neighboring ctx index of the same table row), which changes both the
decoded value and the bits consumed exactly as a ctx-selection bug
would.  If the full-frame pixels then match dav1d, read K with that
alternative is the divergence.

Usage: python tools/av1_divergence_hunt.py /tmp/fail.obu START END
where START/END bound the read-index range to perturb.
"""

import sys
import numpy as np

from tools.dav1d_oracle import decode_obus
from ffpic_tpu.coding import av1_headers as H
from ffpic_tpu.coding import av1_tile as T
from ffpic_tpu.formats.av1_recon import decode_frame


class Hook:
    def __init__(self):
        self.n = 0
        self.log = []
        self.force_k = -1
        self.alt_cdf = None
        self.logging = False

    def reset(self):
        self.n = 0
        self.log = []


HOOK = Hook()
_orig_sym = T.TileDecoder.sym
_orig_bool = T.TileDecoder.boolean
_orig_lit = T.TileDecoder.literal


def sym(self, cdf):
    k = HOOK.n
    HOOK.n += 1
    if k == HOOK.force_k and HOOK.alt_cdf is not None:
        return self.m.decode_symbol(HOOK.alt_cdf)
    v = self.m.decode_symbol(cdf)
    if HOOK.logging:
        f = sys._getframe(1)
        HOOK.log.append((k, "sym", f.f_lineno, len(cdf) - 1, v))
    return v


def boolean(self):
    k = HOOK.n
    HOOK.n += 1
    v = self.m.decode_bool(1 << 14)
    if HOOK.logging:
        f = sys._getframe(1)
        HOOK.log.append((k, "bool", f.f_lineno, 2, v))
    return v


def literal(self, nbits):
    k = HOOK.n
    HOOK.n += 1
    v = self.m.decode_literal(nbits)
    if HOOK.logging:
        f = sys._getframe(1)
        HOOK.log.append((k, f"lit{nbits}", f.f_lineno, 1 << nbits, v))
    return v


T.TileDecoder.sym = sym
T.TileDecoder.boolean = boolean
T.TileDecoder.literal = literal


def main():
    obus = open(sys.argv[1], "rb").read()
    ref, _ = decode_obus(obus, inloop_filters=0)

    def run():
        HOOK.reset()
        try:
            ours, _ = decode_frame(obus, apply_filters=False)
        except Exception as e:
            return None, repr(e)[:60]
        bad = sum(int((a.astype(np.int64) != b.astype(np.int64)).sum())
                  for a, b in zip(ours, ref))
        return bad, None

    HOOK.logging = True
    bad0, _ = run()
    log = HOOK.log
    HOOK.logging = False
    print(f"baseline mismatch {bad0}, total reads {len(log)}")
    if len(sys.argv) < 4:
        return
    start, end = int(sys.argv[2]), int(sys.argv[3])
    for k, kind, line, sz, v in log:
        if start <= k <= end:
            print(f"  read {k}: {kind} line={line} nsym={sz} val={v}")
    # Pass 2: perturb each sym read in range with a *fresh default*
    # cdf of every other ctx cell in the same family is hard to map
    # generically; instead try the crude but effective move of
    # swapping in each OTHER cdf row of the same size from the whole
    # default table set at that read.
    from ffpic_tpu.coding.av1_msac import CdfContext
    from ffpic_tpu.coding.av1_tile import qctx_for_base_q
    # figure qctx from headers
    seq = None
    for obu in H.parse_obus(obus):
        if obu["type"] == H.OBU_SEQUENCE_HEADER:
            seq = H.parse_sequence_header(obu["payload"])
        elif obu["type"] in (H.OBU_FRAME,):
            fh, _ = H.parse_frame_header(obu["payload"], seq)
            break
    qctx = qctx_for_base_q(fh.base_q_idx)
    tables = CdfContext(qctx).tables

    def flatten(prefix, node, out):
        if isinstance(node, list) and node and \
                isinstance(node[0], (int, np.integer)):
            out.append((prefix, node))
        elif isinstance(node, (list, tuple)):
            for i, sub in enumerate(node):
                flatten(f"{prefix}[{i}]", sub, out)
        elif isinstance(node, dict):
            for kk, sub in node.items():
                flatten(f"{prefix}.{kk}", sub, out)

    rows = []
    flatten("", tables, rows)
    by_size = {}
    for name, row in rows:
        by_size.setdefault(len(row) - 1, []).append((name, row))
    hits = []
    for k, kind, line, sz, v in log:
        if not (start <= k <= end) or kind != "sym":
            continue
        cands = by_size.get(sz, [])
        for name, row in cands:
            HOOK.force_k = k
            HOOK.alt_cdf = list(row)
            bad, err = run()
            HOOK.force_k = -1
            HOOK.alt_cdf = None
            if bad == 0:
                hits.append((k, line, name))
                print(f"HIT read {k} (line {line}): cdf {name}")
    if not hits:
        print("no single-read cdf substitution fixes the frame")


if __name__ == "__main__":
    main()
