"""Golden-value regressions on real data (sperr3d_omp_unit_test.cpp parity).

Uses vorticity.128_128_41 from the reference test corpus (the wmag128 blob is
not vendored).  Golden: chunks 64^3, target PSNR 88 -> achieved 89.1123
(sperr3d_omp_unit_test.cpp:238-252).
"""

import os

import numpy as np
import pytest

from sperr_tpu.parallel.chunked3d import Sperr3DCompressor, Sperr3DDecompressor

_DATA = "/root/reference/test_data/vorticity.128_128_41"

pytestmark = pytest.mark.skipif(not os.path.exists(_DATA), reason="test data missing")


def test_vorticity_golden_psnr88():
    vol = np.fromfile(_DATA, dtype=np.float32)
    dims = (128, 128, 41)
    ours = Sperr3DCompressor(dims, (64, 64, 64)).compress(
        vol.reshape(41, 128, 128), "psnr", 88.0
    )
    out, _ = Sperr3DDecompressor().decompress(bytes(ours))
    o32 = out.ravel().astype(np.float32)
    mse = float(np.mean((o32 - vol) ** 2))
    rng = float(vol.max() - vol.min())
    psnr = 10.0 * np.log10(rng * rng / mse)
    assert 89.1122 < psnr < 89.1125


def test_vorticity_2d_golden_bpp4():
    """speck2d_flt_unit_test.cpp:355-356: vorticity.512_512 @4bpp."""
    path = "/root/reference/test_data/vorticity.512_512"
    if not os.path.exists(path):
        pytest.skip("vorticity.512_512 missing")
    from sperr_tpu.codec.speck_flt import SpeckFloatCodec

    data = np.fromfile(path, dtype=np.float32).astype(np.float64)
    codec = SpeckFloatCodec(2, (512, 512, 1))
    stream = codec.compress(data, "rate", 4.0)
    out, _ = codec.decompress(bytes(stream))
    mse = float(np.mean((out - data) ** 2))
    rng = float(data.max() - data.min())
    psnr = 10.0 * np.log10(rng * rng / mse)
    linfty = float(np.max(np.abs(out - data)))
    assert psnr > 71.43
    assert linfty < 2.048e-06
