"""Huffman tests modeled on the reference's tests/test_huffman.c
(4-symbol canonical table decoding a hand-packed "DADBCD" bitstring)."""

import numpy as np

from ffpic_tpu.coding.huffman import HuffmanTable, HuffmanDecoder, HuffmanEncoder
from ffpic_tpu.utils.bitstream import BitReader, BitWriter, MSB
from ffpic_tpu.utils.checksum import crc32, crc32_py, adler32, adler32_py


def _dadbcd_table():
    # codes: A=0 (1 bit), B=10 (2 bits), C=110, D=111 (3 bits)
    counts = [1, 1, 2] + [0] * 13
    symbols = [ord("A"), ord("B"), ord("C"), ord("D")]
    return HuffmanTable(counts, symbols)


def test_canonical_assignment():
    t = _dadbcd_table()
    m = t.encode_map()
    assert m[ord("A")] == (0b0, 1)
    assert m[ord("B")] == (0b10, 2)
    assert m[ord("C")] == (0b110, 3)
    assert m[ord("D")] == (0b111, 3)


def test_decode_dadbcd():
    t = _dadbcd_table()
    w = BitWriter(MSB)
    for ch in "DADBCD":
        code, n = t.encode_map()[ord(ch)]
        w.write_bits(code, n)
    w.align_byte(fill=0)
    r = BitReader(w.getvalue(), MSB)
    dec = HuffmanDecoder(r)
    out = "".join(chr(dec.decode_symbol(t)) for _ in range(6))
    assert out == "DADBCD"


def test_encode_decode_roundtrip_random(rng):
    syms = rng.integers(0, 12, size=500).tolist()
    freqs = {}
    for s in syms:
        freqs[s] = freqs.get(s, 0) + 1
    t = HuffmanTable.from_frequencies(freqs)
    w = BitWriter(MSB)
    enc = HuffmanEncoder(w)
    for s in syms:
        enc.encode_symbol(t, s)
    w.align_byte(fill=0)
    dec = HuffmanDecoder(BitReader(w.getvalue(), MSB))
    assert [dec.decode_symbol(t) for s in syms] == syms


def test_jpeg_k3_table_lut_consistency():
    # ITU-T81 K.3 luminance DC table must build a full consistent LUT
    counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    symbols = list(range(12))
    t = HuffmanTable(counts, symbols)
    # every code round-trips through the LUT
    for code, length, sym in t.codes:
        window = code << (t.maxlen - length)
        assert t.lut_sym[window] == sym
        assert t.lut_len[window] == length


def test_checksums_match_zlib(rng):
    data = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    assert crc32_py(data) == crc32(data)
    assert adler32_py(data) == adler32(data)
    # incremental
    assert crc32(data[500:], crc32(data[:500])) == crc32(data)
