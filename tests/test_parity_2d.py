"""Byte-parity of the 2D float codec against the reference oracle library."""

import numpy as np
import pytest

from sperr_tpu.codec.speck_flt import SpeckFloatCodec
from sperr_tpu.runtime.engine import NumpyEngine

import oracle


pytestmark = pytest.mark.skipif(oracle.get_lib() is None, reason="oracle unavailable")


def _field(nx, ny, seed=42):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:ny, 0:nx]
    smooth = np.sin(x * 0.31) * np.cos(y * 0.17) + 0.2 * np.sin(x * y * 0.001)
    return (smooth + 0.05 * rng.normal(size=(ny, nx))).astype(np.float64).ravel()


@pytest.mark.parametrize(
    "mode,quality",
    [("rate", 2.0), ("psnr", 60.0), ("pwe", 1e-2)],
)
@pytest.mark.parametrize("shape", [(32, 32), (31, 33), (64, 48)])
def test_2d_stream_parity(shape, mode, quality):
    nx, ny = shape
    data = _field(nx, ny)
    ref_stream = oracle.comp_2d(data, (nx, ny), mode, quality, header=False)

    codec = SpeckFloatCodec(2, (nx, ny, 1), engine=NumpyEngine())
    ours = codec.compress(data, mode, quality)
    assert ours == ref_stream, (
        f"stream mismatch: ours {len(ours)}B vs ref {len(ref_stream)}B; "
        f"first diff at {next((i for i in range(min(len(ours), len(ref_stream))) if ours[i] != ref_stream[i]), -1)}"
    )

    # And decoded values must match the oracle bit-for-bit.
    ref_out = oracle.decomp_2d(ref_stream, (nx, ny))
    ours_out, _ = codec.decompress(bytes(ours))
    np.testing.assert_array_equal(ours_out, ref_out)


def test_2d_constant_field():
    nx, ny = 20, 16
    data = np.full(nx * ny, 3.5)
    ref_stream = oracle.comp_2d(data, (nx, ny), "psnr", 80.0, header=False)
    codec = SpeckFloatCodec(2, (nx, ny, 1), engine=NumpyEngine())
    ours = codec.compress(data, "psnr", 80.0)
    assert ours == ref_stream
    assert len(ours) == 17
    out, _ = codec.decompress(bytes(ours))
    np.testing.assert_array_equal(out, data)
