"""One-off trial: 256^3 wave-entropy encode on the real TPU.

Exercises the production chunk dims through TpuCompressor3D with
entropy="wave" (the configuration that OOM'd in round 2 with a 25.8 GB
reshape allocation) and reports wall time, wave coverage, and the PWE
roundtrip error.  Wall-clock here includes the device tunnel; use
runtime/device_bench.py for on-chip stage numbers.
"""

import time

import numpy as np

from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D
from sperr_tpu.runtime.device_bench import _smooth_field

TOL = 1e-2


def main():
    n = 256
    vol = _smooth_field(n)[0]
    comp = TpuCompressor3D((n, n, n), (n, n, n), entropy="wave")
    dec = TpuDecompressor3D()

    t0 = time.perf_counter()
    stream = comp.compress(vol, "pwe", TOL)
    t1 = time.perf_counter()
    print(
        f"encode(+compile): {t1 - t0:.1f}s  bytes={len(stream)}  "
        f"wave_chunks={comp.last_wave_chunks}  "
        f"uncertified={comp.last_uncertified_chunks}"
    )
    t0 = time.perf_counter()
    stream = comp.compress(vol, "pwe", TOL)
    t1 = time.perf_counter()
    print(f"encode(warm): {t1 - t0:.1f}s  wave_chunks={comp.last_wave_chunks}")

    out, _ = dec.decompress(stream)
    err = float(np.abs(out.astype(np.float64) - vol.astype(np.float64)).max())
    print(f"max_err={err:.3e}  tol={TOL}  ok={err <= TOL}")
    assert comp.last_wave_chunks == 1, "wave path fell back to host entropy"
    assert err <= TOL


if __name__ == "__main__":
    main()
