"""Float-codec behavioral tests (mirrors speck2d/3d_flt_unit_test.cpp):
constant-field shortcut, uint-width ladder vs PSNR target, PWE pointwise
bounds, rate-mode high-precision retry, and the 1D codec path."""

import struct

import numpy as np
import pytest

from sperr_tpu.codec import speck_int_np as sp
from sperr_tpu.codec.speck_flt import SpeckFloatCodec

import oracle


def _smooth3d(nx, ny, nz, seed=2, noise=0.01):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    f = np.sin(x * 0.2) * np.cos(y * 0.15) * np.sin(z * 0.1 + 1.0)
    return (f + noise * rng.normal(size=f.shape)).astype(np.float64).ravel()


def test_constant_field_short_stream():
    codec = SpeckFloatCodec(3, (10, 12, 14))
    data = np.full(10 * 12 * 14, -7.25)
    s = codec.compress(data, "psnr", 100.0)
    assert len(s) == 17
    out, _ = codec.decompress(bytes(s))
    np.testing.assert_array_equal(out, data)


def test_uint_width_ladder_with_psnr():
    """Higher PSNR targets need more bitplanes; the stream header reflects
    the chosen integer width ladder (speck3d_flt_unit_test.cpp:63-147)."""
    data = _smooth3d(32, 32, 32)
    widths = []
    for target in (50.0, 90.0, 130.0, 170.0):
        s = SpeckFloatCodec(3, (32, 32, 32)).compress(data, "psnr", target)
        nbp = sp.speck_int_get_num_bitplanes(s[17:18])
        widths.append(sp.uint_width_for_num_bitplanes(nbp))
    assert widths == sorted(widths)
    assert widths[0] <= 16 and widths[-1] >= 32


@pytest.mark.parametrize("tol", [1e-1, 1e-2, 1e-3])
def test_pwe_pointwise(tol):
    data = _smooth3d(24, 20, 28, seed=9)
    codec = SpeckFloatCodec(3, (24, 20, 28))
    s = codec.compress(data, "pwe", tol)
    out, _ = codec.decompress(bytes(s))
    assert np.abs(out - data).max() <= tol


@pytest.mark.skipif(oracle.get_lib() is None, reason="oracle unavailable")
def test_rate_high_precision_retry_parity():
    """A very smooth field at a high bitrate under-produces bits at the
    default q, triggering the FIXED_RATE_HIGH_PREC retry; both the retry
    decision and the resulting stream must match the reference."""
    nx, ny = 32, 32
    y, x = np.mgrid[0:ny, 0:nx]
    data = (np.sin(x * 0.05) + np.cos(y * 0.06)).astype(np.float64).ravel()
    for bpp, want_retry in ((12.0, False), (40.0, True)):
        ref = oracle.comp_2d(data, (nx, ny), "rate", bpp, header=False)
        ours = SpeckFloatCodec(2, (nx, ny, 1)).compress(data, "rate", bpp)
        assert bytes(ours) == ref, bpp
        nbp = sp.speck_int_get_num_bitplanes(ours[17:18])
        assert (nbp > 32) == want_retry
        # And the native chunk codec takes the same retry decision.
        try:
            from sperr_tpu.runtime.native import NativeChunkCodec

            nat = NativeChunkCodec().compress(data, 2, (nx, ny, 1), "rate", bpp)
            assert nat == ref
        except ImportError:
            pass


def test_1d_codec_roundtrip():
    n = 2000
    rng = np.random.default_rng(3)
    data = np.cumsum(rng.normal(size=n)) / 10.0
    codec = SpeckFloatCodec(1, (n, 1, 1))
    s = codec.compress(data, "pwe", 1e-3)
    out, _ = codec.decompress(bytes(s))
    assert np.abs(out - data).max() <= 1e-3

    s2 = codec.compress(data, "psnr", 80.0)
    out2, _ = codec.decompress(bytes(s2))
    rng_ = data.max() - data.min()
    psnr = 10 * np.log10(rng_**2 / np.mean((out2 - data) ** 2))
    assert psnr >= 80.0 - 1.0


def test_native_chunk_codec_2d_1d_parity():
    native = pytest.importorskip("sperr_tpu.runtime.native")
    codec = native.NativeChunkCodec()
    n = 1500
    rng = np.random.default_rng(4)
    data = np.cumsum(rng.normal(size=n)) / 5.0
    for ndim, dims in [(1, (n, 1, 1))]:
        for mode, q in [("pwe", 1e-2), ("psnr", 70.0), ("rate", 2.0)]:
            ref = SpeckFloatCodec(ndim, dims).compress(data, mode, q)
            nat = codec.compress(data, ndim, dims, mode, q)
            assert nat == bytes(ref), (ndim, mode)
            d1 = codec.decompress(nat, ndim, dims)
            d2, _ = SpeckFloatCodec(ndim, dims).decompress(nat)
            np.testing.assert_array_equal(d1, d2)
