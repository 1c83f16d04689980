"""CLI + flat API tests, including byte-parity with the reference C API."""

import os

import numpy as np
import pytest

from sperr_tpu import capi
from sperr_tpu.cli import sperr2d, sperr3d, sperr3d_trunc, show_version

import oracle


def _field2d(nx, ny, seed=4):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:ny, 0:nx]
    return (
        np.sin(x * 0.2) * np.cos(y * 0.13) + 0.03 * rng.normal(size=(ny, nx))
    ).astype(np.float32)


@pytest.mark.skipif(oracle.get_lib() is None, reason="oracle unavailable")
def test_capi_2d_parity_with_header():
    nx, ny = 40, 28
    data = _field2d(nx, ny).ravel()
    ours = capi.comp_2d(data, nx, ny, 2, 70.0, out_inc_header=True)
    ref = oracle.comp_2d(data, (nx, ny), "psnr", 70.0, header=True)
    assert ours == ref
    assert capi.parse_header(ours) == (nx, ny, 1, True)
    out = capi.decomp_2d(ours[10:], nx, ny, output_float=True)
    ref_out = oracle.decomp_2d(ref[10:], (nx, ny), want_float=True)
    np.testing.assert_array_equal(out, ref_out)


@pytest.mark.skipif(oracle.get_lib() is None, reason="oracle unavailable")
def test_capi_3d_parity_and_trunc():
    nx, ny, nz = 30, 20, 24
    rng = np.random.default_rng(5)
    vol = (np.sin(np.arange(nx * ny * nz) * 0.01) + 0.1 * rng.normal(size=nx * ny * nz)).astype(
        np.float64
    )
    ours = capi.comp_3d(vol, nx, ny, nz, 16, 16, 16, mode=2, quality=60.0)
    ref = oracle.comp_3d(vol, (nx, ny, nz), (16, 16, 16), "psnr", 60.0)
    assert bytes(ours) == ref
    assert capi.parse_header(ours) == (nx, ny, nz, False)
    t_ours = capi.trunc_3d(ours, 40)
    assert t_ours == oracle.trunc_3d(ref, 40)
    out, dims = capi.decomp_3d(ours)
    assert dims == (nx, ny, nz)


def test_cli_2d_roundtrip(tmp_path):
    nx, ny = 64, 48
    data = _field2d(nx, ny)
    inp = tmp_path / "in.f32"
    data.ravel().tofile(inp)
    bs = tmp_path / "out.stream"
    rc = sperr2d.run(
        ["-c", str(inp), "--ftype", "32", "--dims", str(nx), str(ny),
         "--bpp", "2.0", "--bitstream", str(bs)]
    )
    assert rc == 0 and bs.exists()
    dec = tmp_path / "dec.f32"
    rc = sperr2d.run(["-d", str(bs), "--decomp_f", str(dec)])
    assert rc == 0
    out = np.fromfile(dec, dtype=np.float32).reshape(ny, nx)
    assert 10 * np.log10(
        (data.max() - data.min()) ** 2 / np.mean((out - data) ** 2)
    ) > 30


def test_cli_3d_roundtrip_and_trunc(tmp_path, capsys):
    nx, ny, nz = 40, 30, 20
    rng = np.random.default_rng(11)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    vol = (np.sin(x * 0.3) * np.cos(y * 0.2) * np.sin(z * 0.15) + 0.01 * rng.normal(size=(nz, ny, nx))).astype(np.float32)
    inp = tmp_path / "in.f32"
    vol.ravel().tofile(inp)
    bs = tmp_path / "v.stream"
    rc = sperr3d.run(
        ["-c", str(inp), "--ftype", "32", "--dims", str(nx), str(ny), str(nz),
         "--chunks", "16", "16", "16", "--pwe", "0.01",
         "--bitstream", str(bs), "--print_stats"]
    )
    assert rc == 0
    stats = capsys.readouterr().out
    assert "PSNR" in stats and "Bitrate" in stats

    dec = tmp_path / "dec.f32"
    rc = sperr3d.run(["-d", str(bs), "--decomp_f", str(dec)])
    assert rc == 0
    out = np.fromfile(dec, dtype=np.float32)
    assert np.abs(out - vol.ravel()).max() <= 0.01 + 1e-7

    tb = tmp_path / "t.stream"
    rc = sperr3d_trunc.run(
        [str(bs), "--pct", "30", "--bitstream", str(tb), "--compare_f", str(inp)]
    )
    assert rc == 0 and tb.exists()
    assert "Bitrate" in capsys.readouterr().out


def test_show_version(capsys):
    assert show_version.run([]) == 0
    out = capsys.readouterr().out
    assert "sperr_tpu" in out and "format major version 0" in out
