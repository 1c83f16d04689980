"""Examples for the sperr_tpu flat API (mirror of the reference C API usage).

Run from the repository root: python examples/python_api.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sperr_tpu import capi


def main():
    # Make a smooth 3D field.
    nz = ny = nx = 64
    z, y, x = np.mgrid[0:nz, 0:ny, 0:nx]
    vol = (np.sin(x * 0.1) * np.cos(y * 0.08) * np.sin(z * 0.12)).astype(np.float32)

    # Compress at a point-wise error bound of 1e-3 (mode 3 == PWE).
    stream = capi.comp_3d(vol.ravel(), nx, ny, nz, 32, 32, 32, mode=3, quality=1e-3)
    print(f"compressed {vol.nbytes} -> {len(stream)} bytes "
          f"({len(stream) * 8 / vol.size:.3f} bpp)")

    # Inspect the header, decompress, verify the bound.
    print("header:", capi.parse_header(stream))
    out, dims = capi.decomp_3d(stream)
    print("max |err| =", np.abs(out - vol.ravel().astype(np.float64)).max())

    # Progressive access: keep 10% of each chunk.
    small = capi.trunc_3d(stream, 10)
    out10, _ = capi.decomp_3d(small)
    print(f"10% stream ({len(small)} bytes): max |err| =",
          np.abs(out10 - vol.ravel().astype(np.float64)).max())


if __name__ == "__main__":
    main()
