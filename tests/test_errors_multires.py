"""Error handling on malformed streams + multi-resolution hierarchy checks."""

import numpy as np
import pytest

from sperr_tpu.parallel.chunked3d import Sperr3DCompressor, Sperr3DDecompressor
from sperr_tpu.stream import tools
from sperr_tpu.utils.dims import coarsened_resolutions_chunked


def test_malformed_streams_raise_stream_error():
    with pytest.raises(tools.StreamError):
        tools.parse_header(b"\x00" * 4)  # too short
    with pytest.raises(tools.StreamError):
        tools.parse_header(b"\x07" + b"\x00" * 40)  # wrong version
    with pytest.raises(tools.StreamError):
        tools.parse_header(b"\x00" * 40)  # zero dims / not 3D
    # 2D flagged stream rejected by the 3D parser
    h2d = tools.generate_2d_header((8, 8), True) + b"\x00" * 30
    with pytest.raises(tools.StreamError):
        tools.parse_header(h2d)
    with pytest.raises(tools.StreamError):
        Sperr3DDecompressor().decompress(b"\x00" * 40)


def test_truncated_header_raises():
    vol = np.zeros((16, 16, 16), dtype=np.float32) + np.arange(16, dtype=np.float32)
    s = Sperr3DCompressor((16, 16, 16), (16, 16, 16)).compress(vol, "psnr", 50.0)
    with pytest.raises(tools.StreamError):
        tools.parse_header(s[:10])


def test_multires_hierarchy_shapes():
    """Multi-chunk multi-resolution decode (sperr3d_omp_unit_test.cpp:306-345)."""
    nx = ny = nz = 64
    rng = np.random.default_rng(12)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    vol = (np.sin(x * 0.2) * np.cos(y * 0.2) * np.sin(z * 0.2)
           + 0.01 * rng.normal(size=(nz, ny, nx))).astype(np.float32)
    stream = Sperr3DCompressor((nx, ny, nz), (32, 32, 32)).compress(vol, "psnr", 75.0)
    dec = Sperr3DDecompressor()
    out, dims = dec.decompress(bytes(stream), multi_res=True)
    res = coarsened_resolutions_chunked((nx, ny, nz), (32, 32, 32))
    assert len(res) == len(dec.hierarchy) > 0
    for arr, r in zip(dec.hierarchy, res):
        assert arr.shape == (r[2], r[1], r[0])
    # Coarsest level should still resemble a downsampled field (finite, sane).
    assert np.isfinite(dec.hierarchy[0]).all()
    # Full-res output accurate.
    mse = float(np.mean((out - vol.astype(np.float64)) ** 2))
    rngv = float(vol.max() - vol.min())
    assert 10 * np.log10(rngv * rngv / mse) > 74.0


def test_multires_device_decoder_matches_host():
    """Multi-resolution decode on the DEVICE path (TpuDecompressor3D +
    cdf97_jax.idwt3d_multi_res): hierarchy shapes match the coarsened
    resolutions and the values agree with the host hierarchy to f32
    roundoff (SPERR3D_OMP_D.cpp:117-126 / CDF97.cpp:140-168)."""
    from sperr_tpu.parallel.batched import TpuDecompressor3D

    nx = ny = nz = 64
    rng = np.random.default_rng(12)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    vol = (np.sin(x * 0.2) * np.cos(y * 0.2) * np.sin(z * 0.2)
           + 0.01 * rng.normal(size=(nz, ny, nx))).astype(np.float32)
    stream = Sperr3DCompressor((nx, ny, nz), (32, 32, 32)).compress(vol, "psnr", 75.0)

    dec_host = Sperr3DDecompressor()
    out_host, _ = dec_host.decompress(bytes(stream), multi_res=True)

    dec_dev = TpuDecompressor3D()
    out_dev, dims = dec_dev.decompress(bytes(stream), multi_res=True)
    assert dims == (nx, ny, nz)

    res = coarsened_resolutions_chunked((nx, ny, nz), (32, 32, 32))
    assert len(dec_dev.hierarchy) == len(res) == len(dec_host.hierarchy)
    scale = np.abs(vol).max()
    for dev_arr, host_arr, r in zip(dec_dev.hierarchy, dec_host.hierarchy, res):
        assert dev_arr.shape == (r[2], r[1], r[0])
        assert np.abs(dev_arr.astype(np.float64) - host_arr).max() <= (
            1e-4 * scale
        )
    # full-res reconstructions agree to f32 roundoff as well
    assert np.abs(out_dev.astype(np.float64) - out_host).max() <= 1e-4 * scale


def test_multires_device_decoder_constant_chunk():
    """Constant chunks fill every hierarchy level with the constant."""
    from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D

    vol = np.full((32, 32, 64), 1.25, dtype=np.float32)
    vol[:, :, 32:] += np.sin(
        np.arange(32, dtype=np.float32) * 0.3
    )[None, None, :]
    stream = TpuCompressor3D((64, 32, 32), (32, 32, 32)).compress(
        vol, "psnr", 70.0
    )
    dec = TpuDecompressor3D()
    out, _ = dec.decompress(bytes(stream), multi_res=True)
    assert len(dec.hierarchy) > 0
    for arr in dec.hierarchy:
        half = arr.shape[2] // 2
        np.testing.assert_allclose(arr[:, :, :half], 1.25, rtol=0, atol=1e-6)


def test_first_failing_chunk_semantics():
    """Per-chunk failures surface as ChunkError carrying the FIRST failing
    chunk's container index (SPERR3D_OMP_C.cpp:132-135 RTNType reduction)."""
    from sperr_tpu.errors import ChunkError

    nx = ny = 32
    nz = 96  # 3 chunks of 32^3
    rng = np.random.default_rng(5)
    vol = rng.normal(size=(nz, ny, nx)).astype(np.float32)
    stream = bytearray(
        Sperr3DCompressor((nx, ny, nz), (32, 32, 32)).compress(vol, "psnr", 60.0)
    )
    h = tools.parse_header(bytes(stream))
    # corrupt chunks 1 and 2 (truncate their SPECK headers to garbage)
    for ci in (1, 2):
        off = h.chunk_offsets[ci * 2]
        stream[off : off + 17] = b"\x00" * 17  # invalid conditioner+speck head
        stream[off + 17] = 255  # num_bitplanes impossible for the dims
    with pytest.raises(ChunkError) as ei:
        Sperr3DDecompressor().decompress(bytes(stream))
    assert ei.value.chunk_index == 1  # smallest failing index wins

    from sperr_tpu.parallel.batched import TpuDecompressor3D

    with pytest.raises(ChunkError) as ei2:
        TpuDecompressor3D().decompress(bytes(stream))
    assert ei2.value.chunk_index == 1
