"""Byte-parity of the 3D chunked pipeline against the reference oracle."""

import numpy as np
import pytest

from sperr_tpu.parallel.chunked3d import Sperr3DCompressor, Sperr3DDecompressor
from sperr_tpu.stream import tools

import oracle

pytestmark = pytest.mark.skipif(oracle.get_lib() is None, reason="oracle unavailable")


def _vol(nx, ny, nz, seed=3):
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    f = np.sin(x * 0.2) * np.cos(y * 0.15) * np.sin(z * 0.1 + 1.0)
    return (f + 0.03 * rng.normal(size=f.shape)).astype(np.float64)


@pytest.mark.parametrize(
    "mode,quality", [("rate", 2.0), ("psnr", 65.0), ("pwe", 5e-3)]
)
def test_single_chunk_parity(mode, quality):
    nx, ny, nz = 32, 32, 32
    vol = _vol(nx, ny, nz)
    ref = oracle.comp_3d(vol.ravel(), (nx, ny, nz), (nx, ny, nz), mode, quality)
    ours = Sperr3DCompressor((nx, ny, nz), (nx, ny, nz)).compress(vol, mode, quality)
    assert bytes(ours) == ref

    ref_out, ref_dims = oracle.decomp_3d(ref)
    our_out, dims = Sperr3DDecompressor().decompress(bytes(ours))
    assert dims == ref_dims
    np.testing.assert_array_equal(our_out.ravel(), ref_out)


@pytest.mark.parametrize("mode,quality", [("psnr", 70.0), ("pwe", 4e-3)])
def test_multi_chunk_parity(mode, quality):
    nx, ny, nz = 40, 30, 50  # -> chunks of 16^3 preferred: irregular remainders
    vol = _vol(nx, ny, nz, seed=9)
    ref = oracle.comp_3d(vol.ravel(), (nx, ny, nz), (16, 16, 16), mode, quality)
    ours = Sperr3DCompressor((nx, ny, nz), (16, 16, 16)).compress(vol, mode, quality)
    assert bytes(ours) == ref

    our_out, _ = Sperr3DDecompressor().decompress(bytes(ours))
    ref_out, _ = oracle.decomp_3d(ref)
    np.testing.assert_array_equal(our_out.ravel(), ref_out)


def test_wavelet_packet_dims_parity():
    # 36x36x9 cannot use dyadic (xy=2 levels, z=1) -> wavelet packet path.
    nx, ny, nz = 36, 36, 9
    vol = _vol(nx, ny, nz, seed=5)
    ref = oracle.comp_3d(vol.ravel(), (nx, ny, nz), (nx, ny, nz), "psnr", 60.0)
    ours = Sperr3DCompressor((nx, ny, nz), (nx, ny, nz)).compress(vol, "psnr", 60.0)
    assert bytes(ours) == ref


def test_float32_flag_and_roundtrip():
    nx, ny, nz = 24, 24, 24
    vol = _vol(nx, ny, nz).astype(np.float32)
    ref = oracle.comp_3d(vol.ravel(), (nx, ny, nz), (nx, ny, nz), "psnr", 60.0)
    ours = Sperr3DCompressor((nx, ny, nz), (nx, ny, nz)).compress(vol, "psnr", 60.0)
    assert bytes(ours) == ref
    h = tools.parse_header(bytes(ours))
    assert h.is_float and h.is_3d and not h.multi_chunk


def test_progressive_truncate_parity():
    nx, ny, nz = 40, 30, 50
    vol = _vol(nx, ny, nz, seed=13)
    full = Sperr3DCompressor((nx, ny, nz), (16, 16, 16)).compress(vol, "psnr", 90.0)
    for pct in (10, 35, 70):
        ref_t = oracle.trunc_3d(bytes(full), pct)
        our_t = tools.progressive_truncate(bytes(full), pct)
        assert our_t == ref_t
        # Portion flag set; truncated stream decodes on both sides identically.
        assert our_t[1] == full[1] + 128
        ours_out, _ = Sperr3DDecompressor().decompress(our_t)
        ref_out, _ = oracle.decomp_3d(ref_t)
        np.testing.assert_array_equal(ours_out.ravel(), ref_out)


def test_progressive_read_matches_truncate(tmp_path):
    nx, ny, nz = 33, 33, 33
    vol = _vol(nx, ny, nz, seed=17)
    full = Sperr3DCompressor((nx, ny, nz), (16, 16, 16)).compress(vol, "psnr", 85.0)
    p = tmp_path / "s.stream"
    p.write_bytes(full)
    for pct in (20, 55):
        assert tools.progressive_read(str(p), pct) == tools.progressive_truncate(
            full, pct
        )
