"""Aux utilities: raw_tools CLI (reference utilities/raw_tools/*) and the
experimental DirectQ mode (reference EXPERIMENTING CompMode::DirectQ,
sperr_helper.h:48-50, SPECK_FLT.cpp:176-186)."""

import numpy as np
import pytest

from sperr_tpu.cli import raw_tools
from sperr_tpu.codec.speck_flt import SpeckFloatCodec


@pytest.fixture
def vol3(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 5, 4)).astype(np.float32)  # nz, ny, nx
    p = tmp_path / "vol.f32"
    a.tofile(p)
    return a, p


def test_compare(vol3, tmp_path, capsys):
    a, p = vol3
    b = a + np.float32(0.001)
    p2 = tmp_path / "vol2.f32"
    b.tofile(p2)
    assert raw_tools.run(["compare", str(p), str(p2), "--ftype", "32"]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out and "RMSE" in out


def test_crop3d_putback3d(vol3, tmp_path):
    a, p = vol3
    small = tmp_path / "small.f32"
    rc = raw_tools.run([
        "crop3d", str(p), str(small), "--dims", "4", "5", "6",
        "--x0", "1", "--x1", "3", "--y0", "0", "--y1", "2",
        "--z0", "2", "--z1", "5",
    ])
    assert rc == 0
    got = np.fromfile(small, dtype=np.float32).reshape(3, 2, 2)
    np.testing.assert_array_equal(got, a[2:5, 0:2, 1:3])
    # zero the small block, paste back, verify
    np.zeros((3, 2, 2), dtype=np.float32).tofile(small)
    rc = raw_tools.run([
        "putback3d", str(p), str(small), "--dims", "4", "5", "6",
        "--small_dims", "2", "2", "3", "--x0", "1", "--y0", "0", "--z0", "2",
    ])
    assert rc == 0
    back = np.fromfile(p, dtype=np.float32).reshape(6, 5, 4)
    assert (back[2:5, 0:2, 1:3] == 0).all()
    assert back[0, 0, 0] == a[0, 0, 0]


def test_crop2d(tmp_path):
    a = np.arange(20, dtype=np.float32).reshape(4, 5)  # ny=4, nx=5
    p = tmp_path / "img.f32"
    a.tofile(p)
    out = tmp_path / "crop.f32"
    rc = raw_tools.run([
        "crop2d", str(p), str(out), "--dims", "5", "4",
        "--x0", "1", "--x1", "4", "--y0", "2", "--y1", "4",
    ])
    assert rc == 0
    got = np.fromfile(out, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(got, a[2:4, 1:4])


def test_convert_roundtrip(tmp_path):
    a = np.array([1.5, -2.25, 3e-9], dtype=np.float32)
    p32, p64 = tmp_path / "a.f32", tmp_path / "a.f64"
    a.tofile(p32)
    assert raw_tools.run(["convert", str(p32), str(p64), "--ftype", "32"]) == 0
    got = np.fromfile(p64, dtype=np.float64)
    np.testing.assert_array_equal(got.astype(np.float32), a)


def test_generate_ball(tmp_path):
    p = tmp_path / "ball.f32"
    assert raw_tools.run(["generate", str(p), "--kind", "ball", "-n", "10"]) == 0
    buf = np.fromfile(p, dtype=np.float32).reshape(10, 10, 10)
    assert np.isfinite(buf).all()
    assert buf[5, 5, 5] == 1.0  # patched singularity


def test_generate_smooth(tmp_path):
    p = tmp_path / "smooth.f32"
    assert raw_tools.run(["generate", str(p), "--kind", "smooth", "-n", "8"]) == 0
    buf = np.fromfile(p, dtype=np.float32)
    assert buf.size == 512 and np.isfinite(buf).all()


# ---------------------------------------------------------------------------
# DirectQ
# ---------------------------------------------------------------------------
def _field(n=32):
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, n)
    f = (
        np.sin(4 * t)[:, None, None]
        * np.cos(3 * t)[None, :, None]
        * np.sin(5 * t)[None, None, :]
    )
    return (f + 0.01 * rng.normal(size=(n, n, n))).astype(np.float64)


def test_directq_stream_matches_pwe_speck_portion():
    """With dq = 1.5*tol, the DirectQ stream equals the conditioner+SPECK
    prefix of the PWE stream (same q, same quantized field); PWE only appends
    its outlier section — pinning that DirectQ is 'PWE minus outlier
    coding'."""
    data = _field(24).reshape(-1)
    dims = (24, 24, 24)
    tol = 1e-2
    c1 = SpeckFloatCodec(3, dims)
    s_pwe = bytes(c1.compress(data.copy(), "pwe", tol))
    c2 = SpeckFloatCodec(3, dims)
    s_dq = bytes(c2.compress(data.copy(), "directq", tol * 1.5))
    assert s_pwe.startswith(s_dq)
    assert len(s_dq) < len(s_pwe)  # this field does produce PWE outliers


def test_directq_roundtrip_and_native_parity():
    data = _field(20).reshape(-1)
    dims = (20, 20, 20)
    q = 5e-3
    codec = SpeckFloatCodec(3, dims)
    stream = bytes(codec.compress(data.copy(), "directq", q))
    out, _ = SpeckFloatCodec(3, dims).decompress(stream)
    # midtread quantization with step q bounds each wavelet-domain error by
    # q/2; spatial error stays small for this field
    assert np.abs(out - data).max() < q * 4

    from sperr_tpu.runtime.native import NativeChunkCodec

    native = NativeChunkCodec(precision=64)
    s2 = bytes(native.compress(data.copy(), 3, dims, "directq", q))
    assert s2 == stream


def test_directq_cli(tmp_path):
    from sperr_tpu.cli import sperr3d

    data = _field(16).astype(np.float32)
    p = tmp_path / "in.f32"
    data.tofile(p)
    out = tmp_path / "out.stream"
    rc = sperr3d.run([
        "-c", str(p), "--ftype", "32", "--dims", "16", "16", "16",
        "--dq", "0.01", "--bitstream", str(out),
    ])
    assert rc == 0
    rec = tmp_path / "rec.f32"
    assert sperr3d.run(["-d", str(out), "--decomp_f", str(rec)]) == 0
    got = np.fromfile(rec, dtype=np.float32)
    assert np.abs(got - data.reshape(-1)).max() < 0.05
