"""Bit container semantics (reference tier-1: bitstream_unit_test.cpp).

Pins the LSB-first stream convention, large random write/read-back (the
reference's 10M-bit RandomOperations test, :259-446), truncated-read zero
padding, and bool<->byte packing equivalence with the reference's 0x80-first
convention (sperr_helper.cpp:150-260)."""

import numpy as np

from sperr_tpu.codec.bitio import BitReader, BitWriter
from sperr_tpu.utils.packing import pack_8_booleans, unpack_8_booleans


def test_lsb_first_convention():
    w = BitWriter()
    for b in (1, 0, 0, 0, 0, 0, 0, 0):  # bit 0 of byte 0
        w.wbit(b)
    assert w.pack() == b"\x01"
    w2 = BitWriter()
    w2.wbits([0, 0, 0, 0, 0, 0, 0, 1])
    assert w2.pack() == b"\x80"


def test_partial_byte_padding():
    w = BitWriter()
    w.wbits([1, 1, 1])
    assert w.pack() == b"\x07"  # tail zero-padded
    assert w.wtell() == 3


def test_pack_prefix():
    w = BitWriter()
    w.wbits([1] * 20)
    assert w.pack(10) == b"\xff\x03"


def test_random_large_roundtrip():
    """Mirror of the reference's 10M-bit random write/read-back."""
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=10_000_000).astype(np.uint8)
    w = BitWriter()
    w.wbits(bits)
    packed = w.pack()
    assert len(packed) == (bits.size + 7) // 8
    r = BitReader(packed, bits.size, bits.size)
    got = r.rbits(bits.size)
    np.testing.assert_array_equal(got, bits)
    # spot-check sequential single-bit reads at random offsets
    r2 = BitReader(packed, bits.size, bits.size)
    for _ in range(100):
        k = int(rng.integers(0, 1000))
        r2.rbits(k)
        assert r2.rbit() == bits[r2.pos - 1]


def test_truncated_reads_return_zero():
    """Progressive-decode semantics: bits past `avail` read as 0
    (SPECK_INT.cpp:91-107)."""
    w = BitWriter()
    w.wbits([1] * 64)
    packed = w.pack()
    r = BitReader(packed, avail_bits=10, total_bits=64)
    first = r.rbits(10)
    assert first.all()
    rest = r.rbits(54)
    assert not rest.any()


def test_bool_packing_reference_convention():
    """b[0] -> bit 7 (the 0x8040201008040201 multiply trick,
    sperr_helper.cpp:150-180)."""
    bools = [True, False, False, False, False, False, False, False]
    assert pack_8_booleans(bools) == 0x80
    bools = [True, False, False, False, False, False, False, True]
    assert pack_8_booleans(bools) == 0x81
    for byte in (0x00, 0xFF, 0x5A, 0x81, 0x33):
        assert pack_8_booleans(unpack_8_booleans(byte)) == byte


def test_writer_reader_interleaved_tell():
    w = BitWriter()
    for i in range(100):
        w.wbit(i % 3 == 0)
        assert w.wtell() == i + 1
    packed = w.pack()
    r = BitReader(packed, 100, 100)
    for i in range(100):
        assert r.rbit() == (1 if i % 3 == 0 else 0)
        assert r.rtell() == i + 1
