"""Broad background substitution hunt: for each sym read in a range,
retry the decode substituting every same-family CDF row (family from
the call-site line), full-frame pixel compare vs dav1d.  Multiprocess.
"""
import sys
import numpy as np
from multiprocessing import Pool

OBU = "/tmp/fail.obu"
START, END = int(sys.argv[1]), int(sys.argv[2])

# family by call-site line -> (table name, restrict fn)
FAMILY = {
    645: "txb_skip", 664: "eob", 670: "eob_extra", 699: "coeff_base_eob",
    727: "coeff_base", 754: "coeff_br", 780: "dc_sign", 330: "skip",
    350: "kf_y_mode", 352: "angle_delta", 359: "uv_mode",
    389: "use_filter_intra", 391: "filter_intra_mode",
    498: "cfl_sign", 502: "cfl_alpha", 506: "cfl_alpha",
    534: "tx_depth", 595: "intra_ext_tx", 224: "partition",
}


def worker(args):
    k, rows = args
    import ffpic_tpu.coding.av1_tile as T
    from ffpic_tpu.formats.av1_recon import decode_frame
    from tools.dav1d_oracle import decode_obus
    obus = open(OBU, "rb").read()
    ref, _ = decode_obus(obus, inloop_filters=0)
    state = {"n": 0, "k": -1, "alt": None}
    orig = T.TileDecoder.sym

    def sym(self, cdf):
        kk = state["n"]
        state["n"] += 1
        if kk == state["k"] and state["alt"] is not None:
            return self.m.decode_symbol(state["alt"])
        return self.m.decode_symbol(cdf)

    T.TileDecoder.sym = sym
    hits = []
    for name, row in rows:
        state.update(n=0, k=k, alt=list(row))
        try:
            ours, _ = decode_frame(obus, apply_filters=False)
            bad = sum(int((a.astype(np.int64) != b.astype(np.int64)).sum())
                      for a, b in zip(ours, ref))
        except Exception:
            bad = -1
        if bad == 0:
            hits.append((k, name))
    T.TileDecoder.sym = orig
    return hits


def main():
    import ffpic_tpu.coding.av1_tile as T
    from ffpic_tpu.formats.av1_recon import decode_frame
    from ffpic_tpu.coding.av1_msac import CdfContext
    from ffpic_tpu.coding.av1_tile import qctx_for_base_q
    from ffpic_tpu.coding import av1_headers as H
    obus = open(OBU, "rb").read()
    log = []
    state = {"n": 0}
    orig = T.TileDecoder.sym

    def sym(self, cdf):
        k = state["n"]
        state["n"] += 1
        f = sys._getframe(1)
        log.append((k, f.f_lineno, len(cdf) - 1))
        return self.m.decode_symbol(cdf)

    T.TileDecoder.sym = sym
    decode_frame(obus, apply_filters=False)
    T.TileDecoder.sym = orig
    seq = None
    for obu in H.parse_obus(obus):
        if obu["type"] == H.OBU_SEQUENCE_HEADER:
            seq = H.parse_sequence_header(obu["payload"])
        elif obu["type"] == H.OBU_FRAME:
            fh, _ = H.parse_frame_header(obu["payload"], seq)
            break
    t = CdfContext(qctx_for_base_q(fh.base_q_idx)).tables

    def flatten(prefix, node, out):
        if isinstance(node, list) and node and \
                isinstance(node[0], (int, np.integer)):
            out.append((prefix, node))
        elif isinstance(node, (list, tuple)):
            for i, sub in enumerate(node):
                flatten(f"{prefix}[{i}]", sub, out)

    jobs = []
    for k, line, sz in log:
        if not (START <= k <= END):
            continue
        fam = FAMILY.get(line)
        rows = []
        if fam == "eob":
            for nm in ("eob_pt_16", "eob_pt_32", "eob_pt_64",
                       "eob_pt_128", "eob_pt_256", "eob_pt_512",
                       "eob_pt_1024"):
                flatten(nm, t[nm], rows)
        elif fam is not None:
            flatten(fam, t[fam], rows)
        else:
            continue
        rows = [(n2, r) for n2, r in rows if len(r) - 1 == sz]
        jobs.append((k, rows))
    print(f"{len(jobs)} reads to test,",
          sum(len(r) for _, r in jobs), "total decodes", flush=True)
    with Pool(4) as p:
        for hits in p.imap_unordered(worker, jobs):
            for h in hits:
                print("HIT", h, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
