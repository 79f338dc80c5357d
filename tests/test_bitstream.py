"""Bitstream unit tests, modeled on the reference's
tests/test_bitstream.c (MSB/LSB reads, step-back, EOF, writer
round-trips)."""

import pytest

from ffpic_tpu.utils.bitstream import BitReader, BitWriter, MSB, LSB


def test_msb_read_bits():
    r = BitReader(bytes([0b10110100, 0b01100011]), MSB)
    assert r.read_bit() == 1
    assert r.read_bits(3) == 0b011
    assert r.read_bits(4) == 0b0100
    assert r.read_bits(8) == 0b01100011
    assert r.eof()


def test_lsb_read_bits():
    # DEFLATE convention: first bit is LSB of the byte and of the value
    r = BitReader(bytes([0b10110100]), LSB)
    assert r.read_bit() == 0
    assert r.read_bit() == 0
    assert r.read_bits(3) == 0b101  # bits 2,3,4 = 1,0,1 -> value 0b101
    assert r.read_bits(3) == 0b101


def test_step_back_and_peek():
    r = BitReader(bytes([0xA5, 0x3C]), MSB)
    v1 = r.read_bits(6)
    r.step_back(6)
    assert r.read_bits(6) == v1
    assert r.peek_bits(10) == r.read_bits(10)
    assert r.eof()


def test_eof_raises():
    r = BitReader(b"\xff", MSB)
    r.read_bits(8)
    with pytest.raises(EOFError):
        r.read_bit()


def test_align_and_byte_reads():
    r = BitReader(bytes(range(8)), MSB)
    r.read_bits(3)
    r.align_byte()
    assert r.byte_offset == 1
    assert r.read_bytes(2) == bytes([1, 2])


def test_writer_roundtrip_msb():
    w = BitWriter(MSB)
    vals = [(0b101, 3), (0b1, 1), (0xABC, 12), (0, 2), (0x3FFFF, 18)]
    for v, n in vals:
        w.write_bits(v, n)
    w.align_byte(fill=0)
    r = BitReader(w.getvalue(), MSB)
    for v, n in vals:
        assert r.read_bits(n) == v


def test_writer_roundtrip_lsb():
    w = BitWriter(LSB)
    vals = [(0b101, 3), (0b1, 1), (0xABC, 12), (0x7F, 7)]
    for v, n in vals:
        w.write_bits(v, n)
    w.align_byte(fill=0)
    r = BitReader(w.getvalue(), LSB)
    for v, n in vals:
        assert r.read_bits(n) == v


def test_jpeg_stuffing():
    # the writer must stuff 0x00 after 0xFF (reference bitstream.c:236-268)
    w = BitWriter(MSB, stuff_jpeg=True)
    w.write_bits(0xFF, 8)
    w.write_bits(0x12, 8)
    assert w.getvalue() == bytes([0xFF, 0x00, 0x12])
