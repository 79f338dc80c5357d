"""Localize a multi-frame AV1 divergence to the first bad FRAME.

dav1d only outputs shown frames, so hidden (alt-ref pyramid) frames
cannot be compared directly.  This probe rebuilds the stream frame by
frame and, after each coded frame F, appends a handcrafted
show_existing_frame temporal unit pointing at a slot F refreshed —
forcing dav1d to emit F's reconstruction.  Our decoder decodes the
same prefix and the probe diffs the ref-slot planes, reporting the
first frame index where they disagree.

Usage: python tools/av1_hidden_probe.py stream.obu
       (or an .avif/.avis file; track/item OBUs are extracted)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from ffpic_tpu.coding import av1_headers as H    # noqa: E402


def leb128(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def obu(t: int, payload: bytes) -> bytes:
    return bytes([(t << 3) | 2]) + leb128(len(payload)) + payload


def show_existing_tu(slot: int) -> bytes:
    """OBU_FRAME_HEADER with show_existing_frame=1 for `slot` (works
    when decoder_model/frame_id fields are absent and the target is a
    non-key frame — no presentation time, no trailing syntax)."""
    byte = 0x80 | (slot << 4) | 0x08   # sfe=1, idx, trailing one-bit
    return obu(H.OBU_FRAME_HEADER, bytes([byte]))


def split_stream(data: bytes):
    """(seq_header_obu_bytes, [per-frame obu bytes]) — frame = one
    OBU_FRAME or OBU_FRAME_HEADER(+TILE_GROUPs)."""
    seq = b""
    frames = []
    cur = b""
    for o in H.parse_obus(data):
        raw = obu(o["type"], o["payload"])
        if o["type"] == H.OBU_SEQUENCE_HEADER:
            seq = raw
        elif o["type"] == H.OBU_FRAME:
            if cur:
                frames.append(cur)
            frames.append(raw)
            cur = b""
        elif o["type"] == H.OBU_FRAME_HEADER:
            if cur:
                frames.append(cur)
            cur = raw
        elif o["type"] == H.OBU_TILE_GROUP:
            cur += raw
    if cur:
        frames.append(cur)
    return seq, frames


def first_bad_frame(obus: bytes, verbose=True, apply_filters=True):
    """Returns (index, bad_counts) of the first coded frame whose
    reconstruction differs from dav1d, or (None, []) if all match."""
    from tools.dav1d_oracle import decode_obus
    from ffpic_tpu.formats.av1_recon import Av1Decoder
    seq_obu, frames = split_stream(obus)
    # capture each frame's parsed header as our decoder sees it
    captured = []
    orig_pfh = H.parse_frame_header

    def spy(payload, seq, refs=None):
        fh, bp = orig_pfh(payload, seq, refs)
        captured.append(fh)
        return fh, bp

    H.parse_frame_header = spy
    try:
        dec = Av1Decoder()
        dec.decode_obus(seq_obu)
        for i, fb in enumerate(frames):
            del captured[:]
            dec.decode_obus(fb)
            fh = captured[0]
            r = _probe_frame(dec, decode_obus, seq_obu, frames, i, fh,
                             verbose)
            if r is not None:
                return i, r
    finally:
        H.parse_frame_header = orig_pfh
    return None, []


def _probe_frame(dec, decode_obus, seq_obu, frames, i, fh, verbose):
    """Diff our ref-slot recon for frame i vs dav1d; returns the bad
    counts list if they differ, else None."""
    if fh.show_existing_frame:
        return None
    if fh.frame_type == 0 and fh.show_frame:
        slot = 0   # shown key frame: all slots refreshed
    else:
        slot = (fh.refresh_frame_flags & -fh.refresh_frame_flags)
        if slot == 0:
            return None    # no slot refreshed; cannot probe
        slot = slot.bit_length() - 1
    probe = seq_obu + b"".join(frames[:i + 1]) + \
        show_existing_tu(slot)
    try:
        refpl = decode_obus(probe, all_frames=True)
    except RuntimeError as e:
        if verbose:
            print(f"frame {i}: dav1d probe failed ({e})")
        return None
    rp = refpl[-1][0]
    rf = dec.refs[slot]
    h, w = rf.height, rf.upscaled_width
    ours = [rf.planes[0][:h, :w]]
    if len(rf.planes) > 1:
        sx, sy = rf.subsampling
        ours += [p[:(h + sy) >> sy, :(w + sx) >> sx]
                 for p in rf.planes[1:]]
    bad = [int((a.astype(np.int64) != b.astype(np.int64)).sum())
           for a, b in zip(ours, rp)]
    if verbose:
        print(f"frame {i}: type={fh.frame_type} "
              f"show={fh.show_frame} slot={slot} bad={bad}")
    if any(bad):
        return bad
    return None


if __name__ == "__main__":
    import sys
    data = open(sys.argv[1], "rb").read()
    if data[4:8] == b"ftyp":
        from ffpic_tpu.formats import basemedia as bm
        boxes = bm.parse_boxes(data, 0, len(data))
        tr = bm.track_samples(data, boxes, "av01")
        if tr is not None:
            es = tr["entry_start"]
            ch = bm.parse_boxes(data, es + 86, es + tr["entry_size"])
            c = bm.find_box(ch, "av1C")
            cfg = data[c.start + 4:c.start + c.size]
            data = cfg + b"".join(data[o:o + s]
                                  for o, s in tr["samples"])
        else:
            from tools.dav1d_oracle import avif_item_obus
            data = avif_item_obus(data)
    i, bad = first_bad_frame(data)
    print("FIRST BAD FRAME:", i, bad)
