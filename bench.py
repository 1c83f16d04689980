"""Headline benchmark: 512^3 f32 PWE-bounded encode+decode GB/s per chip.

Dense stages (conditioning, CDF 9/7 DWT, quantization, outlier detection)
run on the TPU as one batched jit over 256^3 chunks; the SPECK entropy stage
runs on the host via the native C++ engine on a thread pool.

Baseline: the reference encodes 512^3 f32 at ~0.04 GB/s on one CPU core
(BASELINE.md, derived from evaluations/May_11/512_cube.result).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.makedirs(os.path.expanduser("~/.cache/sperr_tpu/jax"), exist_ok=True)

import numpy as np


def make_volume(n=512):
    """Synthetic smooth field, f32, range ~[-2, 2]: a superposition of random
    low-frequency separable modes (no tiling artifacts), plus noise well
    below the PWE tolerance — the operating regime of error-bounded
    compression of simulation output."""
    rng = np.random.default_rng(7)
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    vol = np.zeros((n, n, n), dtype=np.float32)
    for _ in range(24):
        fx, fy, fz = rng.uniform(0.5, 6.0, 3)
        px, py, pz = rng.uniform(0, 2 * np.pi, 3)
        a = np.float32(rng.normal(scale=0.4))
        gx = np.sin(2 * np.pi * fx * t + px).astype(np.float32)
        gy = np.sin(2 * np.pi * fy * t + py).astype(np.float32)
        gz = np.sin(2 * np.pi * fz * t + pz).astype(np.float32)
        vol += a * (gz[:, None, None] * gy[None, :, None] * gx[None, None, :])
    vol += rng.normal(scale=0.001, size=vol.shape).astype(np.float32)
    return vol


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sperr_tpu/jax")
    )
    from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D

    n = int(os.environ.get("BENCH_N", "512"))
    tol = 1e-2
    vol = make_volume(n)
    nbytes = vol.nbytes

    import jax.numpy as jnp

    comp = TpuCompressor3D((n, n, n), (256, 256, 256))
    dec = TpuDecompressor3D()

    def decode_device():
        """Stream -> device-resident chunk blocks (the TPU-native consumer
        path: decompressed fields feed device computation directly)."""
        blocks, dims = dec.decompress(stream, to_host=False)
        # Force completion: touch one element of every block.
        for b in blocks.values():
            _ = float(b[0, 0, 0])
        return blocks

    # Warm-up (compile + caches).
    stream = comp.compress(vol, "pwe", tol)
    blocks = decode_device()

    t0 = time.perf_counter()
    stream = comp.compress(vol, "pwe", tol)
    t1 = time.perf_counter()
    blocks = decode_device()
    t2 = time.perf_counter()

    # Verify the PWE bound on device (only scalars cross back).
    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.abs(a - b))

    err = 0.0
    for (z0, y0, x0, lz, ly, lx), b in blocks.items():
        orig = jnp.asarray(vol[z0 : z0 + lz, y0 : y0 + ly, x0 : x0 + lx])
        err = max(err, float(maxdiff(orig, b)))
    assert err <= tol * 1.001 + 1e-6, f"PWE bound violated: {err}"

    enc_gbps = nbytes / (t1 - t0) / 1e9
    dec_gbps = nbytes / (t2 - t1) / 1e9
    total_gbps = 2 * nbytes / (t2 - t0) / 1e9
    baseline = 0.04  # GB/s, reference single-core encode (BASELINE.md)

    print(
        json.dumps(
            {
                "metric": f"{n}^3 f32 PWE({tol}) encode+decode throughput",
                "value": round(total_gbps, 4),
                "unit": "GB/s/chip",
                "vs_baseline": round(total_gbps / baseline, 2),
                "detail": {
                    "encode_gbps": round(enc_gbps, 4),
                    "decode_gbps": round(dec_gbps, 4),
                    "compressed_bytes": len(stream),
                    "bpp": round(len(stream) * 8 / vol.size, 3),
                    "max_err": err,
                    "devices": [str(d) for d in jax.devices()],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
