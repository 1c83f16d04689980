"""Unit tests for dimension/level math (mirrors sperr_helper_unit_test.cpp)."""

import numpy as np

from sperr_tpu.utils import dims as D
from sperr_tpu.utils import packing as P


def test_num_of_xforms():
    assert D.num_of_xforms(1) == 0
    assert D.num_of_xforms(8) == 0
    assert D.num_of_xforms(9) == 1
    assert D.num_of_xforms(16) == 1
    assert D.num_of_xforms(17) == 2
    assert D.num_of_xforms(64) == 3
    assert D.num_of_xforms(128) == 4
    assert D.num_of_xforms(256) == 5
    assert D.num_of_xforms(512) == 6
    assert D.num_of_xforms(1024) == 6


def test_num_of_partitions():
    assert D.num_of_partitions(0) == 0
    assert D.num_of_partitions(1) == 0
    assert D.num_of_partitions(2) == 1
    assert D.num_of_partitions(3) == 2
    assert D.num_of_partitions(4) == 2
    assert D.num_of_partitions(256) == 8


def test_approx_detail_len():
    assert D.calc_approx_detail_len(7, 0) == (7, 0)
    assert D.calc_approx_detail_len(7, 1) == (4, 3)
    assert D.calc_approx_detail_len(8, 1) == (4, 4)
    assert D.calc_approx_detail_len(8, 2) == (2, 2)
    assert D.calc_approx_detail_len(16, 2) == (4, 4)


def test_dyadic():
    # Expectations from sperr_helper_unit_test.cpp:8-18.
    assert D.can_use_dyadic((64, 1, 1)) is None
    assert D.can_use_dyadic((64, 64, 1)) is None
    assert D.can_use_dyadic((64, 64, 64)) == 3
    assert D.can_use_dyadic((128, 128, 128)) == 4
    assert D.can_use_dyadic((256, 256, 256)) == 5
    assert D.can_use_dyadic((288, 288, 288)) == 6
    assert D.can_use_dyadic((256, 256, 300)) == 5
    assert D.can_use_dyadic((300, 300, 256)) == 5
    assert D.can_use_dyadic((128, 128, 41)) is None


def test_chunk_volume():
    chunks = D.chunk_volume((128, 128, 128), (64, 64, 64))
    assert len(chunks) == 8
    assert chunks[0] == (0, 64, 0, 64, 0, 64)
    assert chunks[-1] == (64, 64, 64, 64, 64, 64)
    # x fastest ordering
    assert chunks[1] == (64, 64, 0, 64, 0, 64)

    # remainder > half a chunk becomes its own segment
    chunks = D.chunk_volume((100, 64, 64), (64, 64, 64))
    assert len(chunks) == 2
    assert chunks[0][1] == 64 and chunks[1][1] == 36

    # remainder <= half merges
    chunks = D.chunk_volume((96, 64, 64), (64, 64, 64))
    assert len(chunks) == 1
    assert chunks[0][1] == 96


def test_coarsened_resolutions():
    # Expectations from sperr_helper_unit_test.cpp lod tests.
    res = D.coarsened_resolutions((64, 64, 1))
    assert len(res) == 3
    assert res[0] == (8, 8, 1) and res[2] == (32, 32, 1)

    res = D.coarsened_resolutions((80, 200, 1))
    assert len(res) == 4
    assert res[0] == (5, 13, 1) and res[2] == (20, 50, 1)

    res = D.coarsened_resolutions((64, 64, 64))
    assert len(res) == 3
    assert res[0] == (8, 8, 8) and res[2] == (32, 32, 32)

    res = D.coarsened_resolutions((144, 144, 288))
    assert len(res) == 5
    assert res[0] == (5, 5, 9) and res[2] == (18, 18, 36) and res[4] == (72, 72, 144)

    res = D.coarsened_resolutions((300, 300, 160))
    assert len(res) == 5
    assert res[0] == (10, 10, 5) and res[2] == (38, 38, 20)

    assert D.coarsened_resolutions((128, 128, 41)) == []

    res = D.coarsened_resolutions_chunked((128, 128, 128), (64, 64, 64))
    assert len(res) == 3
    assert res[-1] == (64, 64, 64)
    assert D.coarsened_resolutions_chunked((100, 64, 64), (64, 64, 64)) == []


def test_pack_booleans():
    b8 = [True, False, True, False, False, False, False, True]
    byte = P.pack_8_booleans(b8)
    assert P.unpack_8_booleans(byte) == b8
    # subtract-mean flag (index 0) lands in bit 7
    assert P.pack_8_booleans([True] + [False] * 7) == 0x80
    assert P.pack_8_booleans([False] * 7 + [True]) == 0x01

    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 1024).astype(bool)
    packed = P.pack_booleans(bits)
    assert np.array_equal(P.unpack_booleans(packed), bits)
