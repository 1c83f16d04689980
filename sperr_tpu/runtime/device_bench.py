"""On-device stage timing: what the TPU actually sustains, tunnel excluded.

This environment reaches the TPU through a tunnel with ~2-8 MB/s
device<->host bandwidth and ~50 ms dispatch latency, so wall-clock around a
device call measures the tunnel, not the chip.  Every timing here therefore
wraps the stage in a jitted `lax.fori_loop` that re-applies it K times with
a data dependency (a numerically-negligible scalar folded back into the
input so XLA cannot hoist the loop body), keeps all operands device-resident,
and divides out K.  Dispatch/transfer constants cancel via (t_K - t_1)/(K-1).

The reference's analog of this measurement is its per-stage timing tables
(reference evaluations/May_11/512_cube.result: XForm vs SPECK seconds at
512^3); here the stages are the device halves of the pipeline.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _dep_scalar(y):
    """A scalar data-dependent on (all leaves of) y."""
    leaves = jax.tree_util.tree_leaves(y)
    acc = None
    for leaf in leaves:
        v = jnp.ravel(leaf)[0].astype(jnp.float32)
        acc = v if acc is None else acc + v
    return acc


def _loop_fn(fn: Callable, iters: int):
    @jax.jit
    def run(x):
        def body(_, x):
            y = fn(x)
            s = _dep_scalar(y).astype(x.dtype)
            # fold the dependency back in at ~1e-38 scale: workload-neutral,
            # but the loop body can't be hoisted as loop-invariant
            return x + s * x.dtype.type(1e-38)

        return jax.lax.fori_loop(0, iters, body, x)

    return run


def time_stage(fn: Callable, x, iters: int = 8, reps: int = 3) -> float:
    """Seconds per application of `fn` on device, dispatch excluded."""
    x = jax.device_put(x)
    run_k = _loop_fn(fn, iters)
    run_1 = _loop_fn(fn, 1)
    # compile + warm both programs
    run_k(x).block_until_ready()
    run_1(x).block_until_ready()
    tk = min(
        _timed(lambda: run_k(x).block_until_ready()) for _ in range(reps)
    )
    t1 = min(
        _timed(lambda: run_1(x).block_until_ready()) for _ in range(reps)
    )
    return max((tk - t1) / (iters - 1), 1e-9)


def _timed(thunk) -> float:
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def pipeline_stages(n: int = 256, batch: int = 1, tol: float = 1e-2,
                    iters: int = 8) -> Dict[str, float]:
    """Per-stage device seconds for one (batch, n^3) f32 chunk batch.

    Stages: fwd DWT, midtread quantize, inverse DWT, the dense encode core
    (condition -> DWT -> quantize -> compaction -> PWE residual scan), and
    the decode core (invquant -> IDWT -> +mean).  Returns seconds per stage
    plus derived GB/s over the batch bytes.
    """
    from ..ops import cdf97_jax as cdfj
    from ..ops import quantize_jax as qzj
    from ..parallel.batched import _encode_core

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(batch, n, n, n)).astype(np.float32)
    x = jnp.asarray(vol)
    nbytes = vol.nbytes
    nelems = batch * n * n * n
    cap = max(1024, nelems // batch // 4)
    out_cap = max(256, (n * n * n) // 64)

    q = jnp.full((batch,), 1.5 * tol, dtype=jnp.float32)

    def quant(y):
        flat = y.reshape(batch, -1)
        return qzj.midtread_quantize_batched(flat, q)

    def enc_core(y):
        out, _ = _encode_core(y, "pwe", float(tol), cap, out_cap, "dual")
        return out

    def dec_core(y):
        flat = y.reshape(batch, -1)
        ll = jnp.rint(flat * (1.0 / q)[:, None]).astype(jnp.int32)
        mags, signs = jnp.abs(ll), ll >= 0
        rec = qzj.midtread_inv_quantize_batched(mags, signs, q)
        rec = cdfj.idwt3d(rec.reshape(y.shape))
        return rec + jnp.float32(0.125)

    stages = {
        "dwt3d": lambda y: cdfj.dwt3d(y),
        "idwt3d": lambda y: cdfj.idwt3d(y),
        "quantize": quant,
        "encode_core_pwe_dual": enc_core,
        "decode_core": dec_core,
    }
    out: Dict[str, float] = {"n": n, "batch": batch, "bytes": nbytes}
    for name, fn in stages.items():
        secs = time_stage(fn, x, iters=iters)
        out[name + "_s"] = round(secs, 5)
        out[name + "_gbps"] = round(nbytes / secs / 1e9, 3)
    out["device_encode_gbps"] = out["encode_core_pwe_dual_gbps"]
    out["device_decode_gbps"] = out["decode_core_gbps"]
    return out


def wave_entropy_stage(n: int = 64, batch: int = 1, tol: float = 1e-2,
                       iters: int = 4) -> Dict[str, float]:
    """Device seconds for the wave-entropy encode (full SPECK bit work on
    device) vs the dense core alone; the difference is the entropy stage."""
    from ..parallel.batched import (
        _dense_encode_sparse, _dense_encode_wave,
    )
    from ..ops import speck_jax as sj
    from ..ops import speck_lis_jax as sl

    rng = np.random.default_rng(5)
    vol = rng.normal(size=(batch, n, n, n)).astype(np.float32) * 0.05
    x = jnp.asarray(vol)
    nelems = n * n * n
    cap = max(1024, nelems // 4)
    out_cap = max(256, nelems // 64)
    num_bp_cap = 34
    node_cap = max(512, nelems // 32)
    lis_row_cap = 24 * node_cap + 1024
    try:
        sj.pyramid_index((n, n, n))
    except ValueError:
        sj.tree_index((n, n, n))
    sl.lis_index((n, n, n))

    def sparse(y):
        return _dense_encode_sparse(y, "pwe", float(tol), cap, out_cap, "dual")

    def wave(y):
        return _dense_encode_wave(
            y, "pwe", float(tol), cap, out_cap, num_bp_cap, (n, n, n),
            "dual", node_cap, lis_row_cap,
        )

    ts = time_stage(sparse, x, iters=iters)
    tw = time_stage(wave, x, iters=iters)
    return {
        "n": n, "batch": batch,
        "dense_core_s": round(ts, 5),
        "wave_total_s": round(tw, 5),
        "entropy_stage_s": round(max(tw - ts, 0.0), 5),
        "wave_encode_gbps": round(vol.nbytes / tw / 1e9, 3),
    }
