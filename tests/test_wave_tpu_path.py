"""Device-entropy compression path (TpuCompressor3D(entropy="wave")).

With entropy="wave" the full SPECK bit computation runs on the device —
LIP/refinement segments (ops/speck_jax.py) and the set walk as per-pass
sorts (ops/speck_lis_jax.py); only stream-sized packed segments cross to
the host, which concatenates and writes headers.  The container must be
byte-identical to the host-entropy path (same device quantization feeds
both)."""

import numpy as np
import pytest

from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D



pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

def _vol(shape=(32, 32, 32), seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape
    t = np.linspace(0, 1, max(shape), dtype=np.float32)
    f = (
        np.sin(6 * t[:nz])[:, None, None]
        * np.cos(4 * t[:ny])[None, :, None]
        * np.sin(5 * t[:nx])[None, None, :]
    ).astype(np.float32)
    return f + rng.normal(scale=0.002, size=shape).astype(np.float32)


@pytest.mark.parametrize("mode,q", [("pwe", 1e-2), ("psnr", 60.0), ("rate", 1.0)])
def test_wave_entropy_matches_host_entropy(mode, q):
    vol = _vol()
    host = TpuCompressor3D((32, 32, 32), (16, 16, 16), entropy="host").compress(
        vol, mode, q
    )
    wave = TpuCompressor3D((32, 32, 32), (16, 16, 16), entropy="wave").compress(
        vol, mode, q
    )
    assert bytes(wave) == bytes(host)


def test_wave_entropy_odd_dims_and_uneven_chunks():
    vol = _vol()[:29, :31, :23].copy()
    host = TpuCompressor3D((23, 31, 29), (16, 16, 16), entropy="host").compress(
        vol, "pwe", 1e-2
    )
    wave = TpuCompressor3D((23, 31, 29), (16, 16, 16), entropy="wave").compress(
        vol, "pwe", 1e-2
    )
    assert bytes(wave) == bytes(host)


def test_wave_entropy_decodes_within_tolerance():
    vol = _vol()
    tol = 1e-2
    stream = TpuCompressor3D((32, 32, 32), (16, 16, 16), entropy="wave").compress(
        vol, "pwe", tol
    )
    out, dims = TpuDecompressor3D().decompress(bytes(stream))
    assert dims == (32, 32, 32)
    assert np.abs(out.astype(np.float64) - vol.astype(np.float64)).max() <= tol * 1.001


def test_wave_entropy_uses_device_walk():
    """On sparse data the full device entropy path (including the on-device
    set walk) must actually run — not silently fall back to host — and the
    container must still match the host path byte for byte."""
    vol = _vol()
    comp_w = TpuCompressor3D((32, 32, 32), (32, 32, 32), entropy="wave")
    wave = comp_w.compress(vol, "pwe", 2e-2)
    assert comp_w.last_wave_chunks == 1
    host = TpuCompressor3D((32, 32, 32), (32, 32, 32), entropy="host").compress(
        vol, "pwe", 2e-2
    )
    assert bytes(wave) == bytes(host)


def test_wave_entropy_dense_data_falls_back():
    """High-entropy data overflows the device candidate/segment caps; the
    wave path must fall back to host entropy (not silently truncate) and
    still match the host container byte-for-byte."""
    rng = np.random.default_rng(9)
    vol = rng.normal(size=(16, 16, 16)).astype(np.float32)  # every pixel significant
    host = TpuCompressor3D((16, 16, 16), (16, 16, 16), entropy="host").compress(
        vol, "pwe", 1e-4
    )
    wave = TpuCompressor3D((16, 16, 16), (16, 16, 16), entropy="wave").compress(
        vol, "pwe", 1e-4
    )
    assert bytes(wave) == bytes(host)


def test_wave_entropy_constant_chunk():
    vol = np.zeros((16, 16, 16), dtype=np.float32)
    vol[:8] = 2.5  # one constant chunk, one not
    vol[8:] = _vol((8, 16, 16))
    host = TpuCompressor3D((16, 16, 16), (16, 16, 8), entropy="host").compress(
        vol, "pwe", 1e-3
    )
    wave = TpuCompressor3D((16, 16, 16), (16, 16, 8), entropy="wave").compress(
        vol, "pwe", 1e-3
    )
    assert bytes(wave) == bytes(host)


def test_wave_device_path_at_production_dims():
    """A full 128^3 chunk runs the ENTIRE entropy stage on device (no cap
    fallback) and the container is byte-identical to the host engine.
    The caps default to exact bounds (all nodes / all pixels), so this holds
    for dense noisy data, the production regime (reference chunks are 256^3,
    utilities/sperr3d.cpp:174)."""
    n = 128
    rng = np.random.default_rng(1)
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    vol = (
        np.sin(x * 0.05) * np.cos(y * 0.07) * np.sin(z * 0.06)
        + 0.01 * rng.normal(size=(n, n, n))
    ).astype(np.float32)
    comp = TpuCompressor3D((n, n, n), (n, n, n), entropy="wave")
    s = comp.compress(vol, "pwe", 1e-2)
    assert comp.last_wave_chunks == 1  # the device path actually ran
    comp_h = TpuCompressor3D((n, n, n), (n, n, n), entropy="host")
    assert bytes(s) == bytes(comp_h.compress(vol, "pwe", 1e-2))


def test_wave_retry_ladder_covers_noise():
    """Noise-like chunks overflow the first event-cap tier; the retry
    ladder must keep them on the device path (no silent host fallback),
    byte-identical to host entropy and within the PWE bound."""
    rng = np.random.default_rng(7)
    vol = rng.normal(size=(32, 32, 32)).astype(np.float64)
    tol = 1e-2
    comp_w = TpuCompressor3D((32, 32, 32), (32, 32, 32), entropy="wave")
    wave = comp_w.compress(vol, "pwe", tol)
    assert comp_w.last_wave_chunks == 1
    host = TpuCompressor3D((32, 32, 32), (32, 32, 32), entropy="host").compress(
        vol, "pwe", tol
    )
    assert bytes(wave) == bytes(host)
    out = TpuDecompressor3D().decompress(bytes(wave))
    arr = np.asarray(out[0] if isinstance(out, tuple) else out, np.float64)
    assert np.abs(arr.reshape(vol.shape) - vol).max() <= tol


def test_wave_dense_transfer_matches_host():
    """transfer="dense" wave (sparse_view off — the PCIe deployment
    shape: full-width emission, host reads the dense quantized array)
    must stay byte-identical across modes and survive outlier/fallback
    paths on noisy data."""
    vol = _vol()
    for mode, q in [("pwe", 1e-2), ("psnr", 60.0), ("rate", 1.0)]:
        host = TpuCompressor3D(
            (32, 32, 32), (16, 16, 16), entropy="host"
        ).compress(vol, mode, q)
        dw = TpuCompressor3D(
            (32, 32, 32), (16, 16, 16), entropy="wave", transfer="dense"
        )
        assert bytes(dw.compress(vol, mode, q)) == bytes(host)
    rng = np.random.default_rng(3)
    nv = rng.normal(size=(32, 32, 32)).astype(np.float32)
    host = TpuCompressor3D(
        (32, 32, 32), (16, 16, 16), entropy="host"
    ).compress(nv, "pwe", 1e-2)
    dw = TpuCompressor3D(
        (32, 32, 32), (16, 16, 16), entropy="wave", transfer="dense"
    )
    assert bytes(dw.compress(nv, "pwe", 1e-2)) == bytes(host)
