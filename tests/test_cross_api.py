"""Cross-API consistency (mirrors examples/C_API/test.sh): the CLI tools and
the flat API must produce byte-identical streams for the same inputs."""

import pytest
import numpy as np

from sperr_tpu import capi
from sperr_tpu.cli import sperr2d, sperr3d



pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

def test_cli_vs_capi_2d(tmp_path):
    nx, ny = 48, 36
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:ny, 0:nx]
    data = (np.sin(x * 0.2) + 0.05 * rng.normal(size=(ny, nx))).astype(np.float32)
    inp = tmp_path / "d.f32"
    data.ravel().tofile(inp)
    for flags, mode, q in [
        (["--bpp", "2.0"], 1, 2.0),
        (["--psnr", "65"], 2, 65.0),
        (["--pwe", "0.01"], 3, 0.01),
    ]:
        bs = tmp_path / "o.stream"
        sperr2d.run(
            ["-c", str(inp), "--ftype", "32", "--dims", str(nx), str(ny),
             *flags, "--bitstream", str(bs)]
        )
        api_stream = capi.comp_2d(data.ravel(), nx, ny, mode, q, out_inc_header=True)
        assert bs.read_bytes() == api_stream, flags


def test_cli_vs_capi_3d(tmp_path):
    nx, ny, nz = 36, 24, 20
    rng = np.random.default_rng(8)
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    vol = (np.cos(x * 0.2) * np.sin(y * 0.25 + z * 0.1)
           + 0.02 * rng.normal(size=(nz, ny, nx))).astype(np.float32)
    inp = tmp_path / "v.f32"
    vol.ravel().tofile(inp)
    bs = tmp_path / "v.stream"
    sperr3d.run(
        ["-c", str(inp), "--ftype", "32", "--dims", str(nx), str(ny), str(nz),
         "--chunks", "16", "16", "16", "--psnr", "70", "--bitstream", str(bs)]
    )
    api_stream = capi.comp_3d(
        vol.ravel(), nx, ny, nz, 16, 16, 16, mode=2, quality=70.0
    )
    assert bs.read_bytes() == bytes(api_stream)
