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
    """A scalar data-dependent on EVERY element of every leaf of y.

    Must be a position-weighted full reduction: consuming only y[0] lets
    XLA's simplifier rewrite the stage itself (slice(sort) -> reduce-min,
    slice-mover through elementwise chains), and a plain sum can be
    simplified through permutations — both silently turn the measured
    stage into a sliver of itself (observed: 16.7M-element sorts "timing"
    at 0 ms)."""
    leaves = jax.tree_util.tree_leaves(y)
    acc = None
    for leaf in leaves:
        flat = jnp.ravel(leaf)
        w = (jnp.arange(flat.shape[0], dtype=jnp.int32) & 7).astype(jnp.float32)
        v = jnp.sum(flat.astype(jnp.float32) * w)
        acc = v if acc is None else acc + v
    return acc


def _loop_fn(fn: Callable, iters: int):
    @jax.jit
    def run(x):
        def body(_, carry):
            x, acc = carry
            y = fn(x)
            s = _dep_scalar(y)
            # fold the dependency back in so the loop body can't be hoisted
            # as loop-invariant: floats get a tiny (above-denormal-flush)
            # additive term; integers get a 0/1 perturbation — a cast of
            # 1e-30 to an int dtype is exactly 0, which WOULD hoist
            if jnp.issubdtype(x.dtype, jnp.floating):
                pert = (s * jnp.float32(1e-30)).astype(x.dtype)
            else:
                pert = (jnp.abs(s).astype(jnp.int32) & 1).astype(x.dtype)
            return x + pert, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(
            0, iters, body, (x, jnp.float32(0.0))
        )
        # scalar output: fetching it is the ONLY reliable synchronization —
        # on the axon remote backend block_until_ready() returns while the
        # computation is still in flight (measured: 0.2 ms "wait" on a
        # multi-second program)
        return acc

    return run


def time_stage(fn: Callable, x, iters: int = 8, reps: int = 2,
               max_iters: int = 128) -> float:
    """Seconds per application of `fn` on device, dispatch excluded.

    Synchronizes by fetching the loop's scalar accumulator (see _loop_fn).
    Adaptive: the per-iteration cost is the marginal (t_K - t_1)/(K - 1);
    on a tunnel with multi-ms dispatch jitter that difference is noise for
    sub-ms stages, so K grows until the K-iteration run is decisively
    longer than the 1-iteration run (or max_iters is reached)."""
    x = jax.device_put(x)
    run_1 = _loop_fn(fn, 1)
    float(run_1(x))  # compile + warm
    t1 = min(_timed(lambda: float(run_1(x))) for _ in range(reps))
    k = max(2, iters)
    while True:
        run_k = _loop_fn(fn, k)
        float(run_k(x))
        tk = min(_timed(lambda: float(run_k(x))) for _ in range(reps))
        # signal must dominate the constant's jitter (~25% of t1 + 2ms).
        # Every k is a fresh compile (static fori_loop length), and through
        # the tunnel each compile costs tens of seconds — the ladder must
        # stay short; at max_iters the result is an upper bound on a stage
        # that is already negligibly small.
        if tk - t1 > max(0.25 * t1, 2e-3) or k >= max_iters:
            return max((tk - t1) / (k - 1), 1e-9)
        k *= 4


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

    def enc_dense(y):
        # the transfer="dense" encode: condition -> DWT -> quantize ->
        # decoder-exact dual residual — pure math, no device compaction
        from ..parallel.batched import _dense_encode

        return _dense_encode(y, "pwe", float(tol), "dual")

    def enc_sparse(y):
        # the transfer="sparse" encode: + on-device nonzero/outlier
        # compaction (a large-array scatter — tunnel-sized transfers at a
        # heavy device cost; see docs/PALLAS.md roofline notes)
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
        "encode_core_dense": enc_dense,
        "encode_core_sparse": enc_sparse,
        "decode_core": dec_core,
    }
    out: Dict[str, float] = {"n": n, "batch": batch, "bytes": nbytes}
    for name, fn in stages.items():
        secs = time_stage(fn, x, iters=iters)
        out[name + "_s"] = round(secs, 5)
        out[name + "_gbps"] = round(nbytes / secs / 1e9, 3)
    out["device_encode_gbps"] = out["encode_core_dense_gbps"]
    out["device_decode_gbps"] = out["decode_core_gbps"]
    return out


def wave_entropy_breakdown(n: int = 64, tol: float = 1e-2,
                           iters: int = 4) -> Dict[str, float]:
    """Per-substage device seconds for the wave-entropy encode at one n^3
    chunk: cumulative chains c0..c8 are timed (every chain re-applies all
    earlier substages to the perturbed input so nothing is hoistable), and
    the reported per-substage cost is the delta between adjacent chains.

    Substages mirror _dense_encode_wave's one(): quantize -> pixel schedule
    -> exposed-pixel compaction -> LIP event expansion -> LIP pass
    sort+pack -> refinement events -> the LIS walk (whole)."""
    from ..ops import cdf97_jax as cdfj
    from ..ops import quantize_jax as qzj
    from ..ops import speck_jax as sj
    from ..ops import speck_lis_jax as sl

    from ..ops import speck_virtual as svirt
    from ..parallel.batched import DEFAULT_WAVE_TIERS, _ev_caps3

    vol = _smooth_field(n)[0]
    x = jnp.asarray(vol)
    nelems = n * n * n
    num_bp_cap = 34
    vfi = svirt.virtual_lis_index((n, n, n)) if svirt._is_pow2_cube(
        (n, n, n)
    ) else None
    pti = None
    ti = None
    if vfi is None:
        try:
            pti = sj.pyramid_index((n, n, n))
        except ValueError:
            ti = sj.tree_index((n, n, n))
    li = vfi if vfi is not None else sl.lis_index((n, n, n))
    nf, em, wf = DEFAULT_WAVE_TIERS[0]
    node_cap = li.nn if nf >= 1.0 else max(512, min(li.nn, int(li.nn * nf)))
    lip_cap, lis_cap, ref_cap = _ev_caps3(em, nelems)
    wave_cap = nelems if wf >= 1.0 else max(1024, int(nelems * wf))
    cap_total = sj.cap_total_bytes(
        nelems, num_bp_cap, wave_cap, (lip_cap, lis_cap, ref_cap)
    )
    _W_NEVER = 0x7FFF
    q = jnp.float32(1.5 * tol)

    def to_ll(y):
        cond = y - jnp.mean(y)
        coeffs = cdfj.dwt3d(cond).reshape(nelems)
        return jnp.rint(coeffs * (1.0 / q)).astype(jnp.int32)

    def to_sched(y):
        ll = to_ll(y)
        mags = jnp.abs(ll).astype(jnp.uint32)
        pm = sj.msbp1_device(mags)
        num_bp = jnp.max(pm)
        if vfi is not None:
            s, e, nm = svirt.pixel_schedule_virtual(mags, vfi, num_bp)
        elif pti is not None:
            s, e, nm = sj.pixel_schedule_pyramid(mags, pti, num_bp)
        else:
            s, e, nm = sj.pixel_schedule(mags, ti, num_bp)
        return ll, mags, s, e, nm, num_bp

    def to_compact(y):
        ll, mags, s, e, nm, num_bp = to_sched(y)
        sgn = ll >= 0
        exposed = e < num_bp
        s_c, e_c, m_c, g_c, _ = sj.compact_schedule_by_sort(
            exposed, s, e, mags, sgn, wave_cap
        )
        return ll, s, e, nm, num_bp, sgn, s_c, e_c, m_c, g_c

    def to_lip_expand(y):
        r = to_compact(y)
        _, _, _, _, num_bp, _, s_c, e_c, m_c, g_c = r
        lo = jnp.minimum(e_c + 1, 63)
        hi_dec = jnp.minimum(s_c, num_bp - 1)
        has_sign = (s_c <= num_bp - 1) & (lo <= hi_dec)
        hi = hi_dec + has_sign.astype(jnp.int32)
        ln = jnp.where(lo <= hi, hi - lo + 1, 0)
        w = (lo | (jnp.clip(hi, 0, 63) << 6)
             | (has_sign.astype(jnp.int32) << 12)
             | (g_c.astype(jnp.int32) << 13))
        (wf,), rel, ev_ok, ev_total = sj._expand_fill(
            ln, [w], lip_cap, widths=[14]
        )
        return r, wf, rel, ev_ok, ev_total

    def to_lip_pack(y):
        r, wf, rel, ev_ok, ev_total = to_lip_expand(y)
        num_bp = r[4]
        lo_e = wf & 63
        hi_e = (wf >> 6) & 63
        hs_e = (wf >> 12) & 1
        sg_e = (wf >> 13) & 1
        p_raw = lo_e + rel
        is_sign = (hs_e == 1) & (p_raw == hi_e)
        p_ev = jnp.where(is_sign, p_raw - 1, p_raw)
        bit_ev = jnp.where(is_sign, sg_e == 1,
                           (hs_e == 1) & (p_raw == hi_e - 1))
        p_key = jnp.where(ev_ok, p_ev, num_bp_cap)
        lip = sj.events_to_segments(p_key, None, bit_ev, num_bp_cap, cap_total)
        return r, lip

    def to_ref(y):
        r, lip = to_lip_pack(y)
        _, _, _, _, num_bp, _, s_c, e_c, m_c, g_c = r
        rlo = jnp.minimum(s_c + 1, 63)
        rhi = jnp.broadcast_to(num_bp - 1, rlo.shape)
        rln = jnp.where(rlo <= rhi, rhi - rlo + 1, 0)
        (rlo_f, m_f), rrel, rok, rtotal = sj._expand_fill(
            rln, [rlo, m_c], ref_cap, widths=[6, 31]
        )
        rp = rlo_f + rrel
        shift = jnp.clip(num_bp - 1 - rp, 0, 31).astype(jnp.uint32)
        rbit = ((m_f.astype(jnp.uint32) >> shift) & jnp.uint32(1)).astype(bool)
        rp_key = jnp.where(rok, rp, num_bp_cap)
        ref = sj.events_to_segments(rp_key, None, rbit, num_bp_cap, cap_total)
        return r, lip, ref

    def to_full(y):
        r, lip, ref = to_ref(y)
        ll, s, e, nm, num_bp, sgn = r[:6]
        node_s = jnp.where(nm > 0, num_bp - nm, _W_NEVER).astype(jnp.int32)
        lis = sl.lis_segments_device(
            node_s, s, sgn, num_bp, li, num_bp_cap, node_cap, lis_cap,
            cap_total,
        )
        return r, lip, ref, lis

    chains = {
        "quantize": to_ll,
        "schedule": to_sched,
        "exposed_compact": to_compact,
        "lip_expand": to_lip_expand,
        "lip_pack": to_lip_pack,
        "ref_events": to_ref,
        "lis_walk": to_full,
    }
    out: Dict[str, float] = {"n": n}
    prev = 0.0
    for name, fn in chains.items():
        secs = time_stage(fn, x, iters=iters)
        out[name + "_cum_s"] = round(secs, 5)
        out[name + "_s"] = round(secs - prev, 5)
        prev = secs
    return out


def _smooth_field(n: int, batch: int = 1, seed: int = 7) -> np.ndarray:
    """Superposed low-frequency separable modes + sub-tolerance noise: the
    operating regime of error-bounded compression (mirrors bench.py's
    make_volume).  Noise-like fields saturate every wave cap and retry at
    the wider tiers — a different (measurable but non-headline) regime."""
    rng = np.random.default_rng(seed)
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
    return np.broadcast_to(vol, (batch, n, n, n)).copy()


def wave_entropy_stage(n: int = 64, batch: int = 1, tol: float = 1e-2,
                       iters: int = 4, noisy: bool = False) -> Dict[str, float]:
    """Device seconds for the wave-entropy encode (full SPECK bit work on
    device) vs the dense core alone; the difference is the entropy stage.

    Default: the production tier-0 capacities (TpuCompressor3D.wave_tiers)
    on a smooth field — the configuration and regime the driver actually
    runs for the headline workload.  noisy=True measures the adversarial
    regime instead: a white-noise field at the widest tier's caps (what a
    retried cap-overflowing chunk costs on device)."""
    from ..parallel.batched import (
        DEFAULT_WAVE_TIERS, _dense_encode_sparse, _dense_encode_wave,
        _ev_caps3,
    )
    from ..ops import speck_jax as sj
    from ..ops import speck_lis_jax as sl

    if noisy:
        rng = np.random.default_rng(11)
        vol = rng.normal(size=(batch, n, n, n)).astype(np.float32)
    else:
        vol = _smooth_field(n, batch)
    x = jnp.asarray(vol)
    nelems = n * n * n
    cap = max(1024, nelems // 4)
    out_cap = max(256, nelems // 64)
    num_bp_cap = 34
    from ..ops import speck_virtual as svirt

    if svirt._is_pow2_cube((n, n, n)):
        li = svirt.virtual_lis_index((n, n, n))
    else:
        try:
            sj.pyramid_index((n, n, n))
        except ValueError:
            sj.tree_index((n, n, n))
        li = sl.lis_index((n, n, n))
    nf, em, wf = DEFAULT_WAVE_TIERS[-1 if noisy else 0]
    node_cap = li.nn if nf >= 1.0 else max(512, min(li.nn, int(li.nn * nf)))
    ev_caps = _ev_caps3(em, nelems)
    wave_cap = nelems if wf >= 1.0 else max(1024, int(nelems * wf))

    def sparse(y):
        return _dense_encode_sparse(y, "pwe", float(tol), cap, out_cap, "dual")

    def wave(y):
        return _dense_encode_wave(
            y, "pwe", float(tol), cap, out_cap, num_bp_cap, (n, n, n),
            "dual", node_cap, ev_caps, wave_cap,
        )

    ts = time_stage(sparse, x, iters=iters)
    tw = time_stage(wave, x, iters=iters)
    return {
        "n": n, "batch": batch,
        "regime": "noisy(widest tier)" if noisy else "smooth(tier 0)",
        "dense_core_s": round(ts, 5),
        "wave_total_s": round(tw, 5),
        "entropy_stage_s": round(max(tw - ts, 0.0), 5),
        "entropy_per_chunk_ms": round(max(tw - ts, 0.0) / batch * 1e3, 3),
        "wave_encode_gbps": round(vol.nbytes / tw / 1e9, 3),
    }
