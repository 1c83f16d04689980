"""Headline benchmark: 512^3 f32 PWE-bounded encode+decode GB/s per chip.

Two execution engines are measured:

  * host-native: the C++ per-chunk pipeline (CDF 9/7 + quantize + SPECK) on
    a thread pool over 256^3 chunks — byte-identical streams to the
    reference, scales with host cores.
  * tpu: dense stages device-batched (one jit over the chunk batch, shardable
    over a mesh), entropy on host.  NOTE: on this environment the TPU is
    reached through a tunnel with ~2-8 MB/s device->host bandwidth and ~50ms
    dispatch latency, which caps the device path far below the hardware's
    capability; the TPU path is measured at 256^3 and reported in `detail`.

Headline value = best 512^3 engine.  Baseline: the reference encodes 512^3
f32 at ~0.04 GB/s on one CPU core (BASELINE.md, May_11/512_cube.result).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import time

import numpy as np


def _silence_stderr():
    """Redirect fd 2 to a log file so backend noise (axon INFO spew, XLA
    warnings) can never push the JSON result line out of the driver's
    output tail (round 2 lost the headline exactly this way)."""
    try:
        log = open("/tmp/sperr_bench_stderr.log", "w")
        os.dup2(log.fileno(), 2)
        sys.stderr = log
    except Exception:
        pass


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


TOL = 1e-2

_T0 = time.time()


def _progress(msg):
    """Timestamped progress marker on stderr (-> /tmp/sperr_bench_stderr.log):
    lets a human (or a post-mortem) see where a wedged run spent its time."""
    try:
        sys.stderr.write(f"[bench +{time.time() - _T0:7.1f}s] {msg}\n")
        sys.stderr.flush()
    except Exception:
        pass


# Wall-clock deadline for the whole benchmark: on a slow-tunnel day each
# device stage costs minutes of transfer wait (observed 2026-08-21: 8 min
# for the 64^3 stage that normally takes seconds), and an unbounded run can
# exceed the driver's patience and record NOTHING.  Stages are ordered by
# headline value; once the deadline passes, remaining device sections are
# skipped with a note.
_DEADLINE = _T0 + float(os.environ.get("BENCH_DEADLINE", "2100"))


def _remaining():
    return _DEADLINE - time.time()


def _dump_partial(obj):
    """Best-effort partial detail dump: survives a later kill."""
    try:
        with open("/tmp/sperr_bench_detail_partial.json", "w") as f:
            json.dump(obj, f, indent=1, default=str)
    except Exception:
        pass

# SDRBench configurations from BASELINE.json: loaded from $SDRBENCH_DIR
# when the datasets are present, synthetic stand-ins at the exact dims
# otherwise (so the configs are always runnable).
SDR_CONFIGS = {
    # name: (dims (nx, ny, nz) x-fastest, candidate file names)
    "miranda": ((384, 384, 256), ("density.f32", "miranda_density.f32")),
    "nyx": ((512, 512, 512), ("temperature.f32", "nyx_temperature.f32")),
}


def load_config(name):
    """(volume zyx-shaped f32, source tag) for a named SDRBench config."""
    dims, candidates = SDR_CONFIGS[name]
    nx, ny, nz = dims
    d = os.environ.get("SDRBENCH_DIR", "")
    for fn in candidates if d else ():
        p = os.path.join(d, fn)
        if os.path.exists(p):
            data = np.fromfile(p, dtype=np.float32)
            if data.size == nx * ny * nz:
                return data.reshape(nz, ny, nx), f"sdrbench:{p}"
    vol = make_volume(max(dims))[:nz, :ny, :nx]
    return np.ascontiguousarray(vol), "synthetic stand-in"


def run_host(vol):
    """Host-native fast mode (f32 pipeline): the per-chip throughput path for
    f32 inputs; the f64 parity mode is the interchange path."""
    from sperr_tpu.parallel.chunked3d import Sperr3DCompressor, Sperr3DDecompressor

    nz, ny, nx = vol.shape
    comp = Sperr3DCompressor((nx, ny, nz), (256, 256, 256), precision=32)
    dec = Sperr3DDecompressor(precision=32)
    stream = comp.compress(vol, "pwe", TOL)  # warm (builds native lib)
    # Preallocated warm output: this VM's kernel zeroes fresh pages at only
    # ~0.2 GB/s, which would otherwise dominate the decode measurement.
    out = np.empty((nz, ny, nx), dtype=np.float32)
    dec.decompress(bytes(stream), out=out)

    # Best of 3: this box is a noisy shared VM (runs vary 2-3x).
    enc_t, dec_t = [], []
    sbytes = bytes(stream)
    for _ in range(3):
        t0 = time.perf_counter()
        stream = comp.compress(vol, "pwe", TOL)
        t1 = time.perf_counter()
        out, _ = dec.decompress(sbytes, out=out)
        t2 = time.perf_counter()
        enc_t.append(t1 - t0)
        dec_t.append(t2 - t1)
    err = float(np.abs(out.astype(np.float64) - vol.astype(np.float64)).max())
    assert err <= TOL, f"PWE bound violated (host): {err}"
    return min(enc_t), min(dec_t), len(stream), err


def run_tpu(vol, entropy="host"):
    import jax
    import jax.numpy as jnp

    from sperr_tpu.parallel.batched import TpuCompressor3D, TpuDecompressor3D

    nz, ny, nx = vol.shape
    comp = TpuCompressor3D((nx, ny, nz), (256, 256, 256), entropy=entropy)
    dec = TpuDecompressor3D()

    def decode_device():
        blocks, _ = dec.decompress(stream, to_host=False)
        for b in blocks.values():
            _ = float(b[0, 0, 0])  # force completion
        return blocks

    stream = comp.compress(vol, "pwe", TOL)  # warm (compiles)
    blocks = decode_device()

    t0 = time.perf_counter()
    stream = comp.compress(vol, "pwe", TOL)
    t1 = time.perf_counter()
    blocks = decode_device()
    t2 = time.perf_counter()

    @jax.jit
    def maxdiff(a, b):
        return jnp.max(jnp.abs(a - b))

    err = 0.0
    for (z0, y0, x0, lz, ly, lx), b in blocks.items():
        orig = jnp.asarray(vol[z0 : z0 + lz, y0 : y0 + ly, x0 : x0 + lx])
        err = max(err, float(maxdiff(orig, b)))
    assert err <= TOL, f"PWE bound violated (tpu): {err}"
    return t1 - t0, t2 - t1, len(stream), err, comp.last_wave_chunks


class _StageTimeout(Exception):
    pass


class _watchdog:
    """SIGALRM guard around a device-stage measurement: if the tunnel dies
    MID-RUN, a device fetch blocks forever (no exception) — without this
    the whole benchmark wedges.  After the first timeout fires, remaining
    device sections are skipped fast (the backend is assumed gone)."""

    tripped = False

    def __init__(self, seconds):
        self.seconds = int(seconds)

    def __enter__(self):
        import signal

        if _watchdog.tripped:
            raise _StageTimeout("device backend previously timed out")

        def handler(signum, frame):
            raise _StageTimeout(f"stage exceeded {self.seconds}s")

        self._old = signal.signal(signal.SIGALRM, handler)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, et, ev, tb):
        import signal

        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        if et is _StageTimeout:
            _watchdog.tripped = True
        return False


def run_device_stages():
    """On-device stage timings (tunnel/dispatch excluded): the chip number.
    See sperr_tpu/runtime/device_bench.py."""
    from sperr_tpu.runtime.device_bench import pipeline_stages, wave_entropy_stage

    budget = int(os.environ.get("BENCH_STAGE_TIMEOUT", "1500"))
    n = int(os.environ.get("BENCH_STAGE_N", "256"))

    def _budget():
        # per-stage watchdog, capped by the global deadline (min 60s so an
        # almost-expired deadline still lets a cached stage finish)
        return int(max(60, min(budget, _remaining())))

    _progress("stages: pipeline_stages")
    with _watchdog(_budget()):
        out = pipeline_stages(n=n, batch=1, tol=TOL, iters=4)
    _dump_partial(out)
    nch = int(os.environ.get("BENCH_DECODE_CHUNKS", "8"))
    if os.environ.get("BENCH_DECODE_TOTAL", "1") != "0":
        # honest container decode at the 512^3 flagship shape (8 x 256^3
        # chunks): host SPECK parse (wall, summed) + device reconstruction
        # (stage-timed, chunk-batched) — consumes every stream byte; the
        # hybrid sub-result is the production decoder's split
        from sperr_tpu.runtime.device_bench import container_decode_stages

        _progress("stages: container_decode")
        try:
            with _watchdog(_budget()):
                cd = container_decode_stages(n=n, tol=TOL, chunks=nch)
            out["container_decode"] = cd
            out["decode_total_s"] = cd["decode_total_s"]
        except Exception as e:  # pragma: no cover
            out["container_decode"] = {"error": f"{type(e).__name__}: {e}"}
        _dump_partial(out)

    def _wave(key, **kw):
        if _remaining() <= 45:
            out[key] = {"skipped": "bench deadline passed (slow tunnel)"}
            _progress(f"stages: {key} SKIPPED (deadline)")
            return
        _progress(f"stages: {key}")
        try:
            with _watchdog(_budget()):
                out[key] = wave_entropy_stage(tol=TOL, **kw)
        except Exception as e:  # pragma: no cover
            out[key] = {"error": f"{type(e).__name__}: {e}"}
        _dump_partial(out)

    # Stage order = headline value: the 512^3 flagship (scan over 8 chunks,
    # BASELINE.json's actual config) and its 256^3 fallback come before the
    # small/regime rows, so a deadline-truncated run still has a headline.
    wpn = int(os.environ.get("BENCH_WAVE_PROD_N", "256"))
    if os.environ.get("BENCH_WAVE_512", "1") != "0":
        _wave("wave_entropy_512", n=256, batch=nch)
    if wpn:
        # the production-chunk-dims wave number: the whole SPECK bit
        # computation on device at the reference's default chunk size
        # (sperr3d.cpp:174)
        _wave("wave_entropy_256", n=wpn, batch=1)
    wn = int(os.environ.get("BENCH_WAVE_N", "64"))
    _wave("wave_entropy", n=wn, batch=1)
    if os.environ.get("BENCH_WAVE_DENSE", "1") != "0":
        # reference-comparable rate band (~2 bpp: noise at 2.5x tol): the
        # regime every BASELINE.md timing row ran at
        _wave("wave_entropy_256_dense", n=wpn or 256, batch=1,
              regime="dense")
    if os.environ.get("BENCH_WAVE_NOISY", "1") != "0":
        # the adversarial regime: white noise, every cap saturated, at
        # the tier the retry ladder lands on
        _wave("wave_entropy_noisy", n=wpn or 256, batch=1, regime="noisy")
    if os.environ.get("BENCH_WAVE_2D", "1") != "0" and _remaining() > 45:
        # the 2D device pipeline (Turbulence1024-like batch; BASELINE.md
        # 2D rows are the reference comparison)
        from sperr_tpu.runtime.device_bench import wave2d_stage

        _progress("stages: wave_2d_1024")
        try:
            with _watchdog(_budget()):
                out["wave_2d_1024"] = wave2d_stage(tol=TOL)
        except Exception as e:  # pragma: no cover
            out["wave_2d_1024"] = {"error": f"{type(e).__name__}: {e}"}
        _dump_partial(out)
    if os.environ.get("BENCH_WAVE_BREAKDOWN", "0") != "0":
        # substage deltas: ~10 extra compiles through the tunnel, opt-in
        from sperr_tpu.runtime.device_bench import wave_entropy_breakdown

        try:
            with _watchdog(_budget()):
                out["wave_entropy_breakdown"] = wave_entropy_breakdown(
                    n=wn, tol=TOL
                )
        except Exception as e:  # pragma: no cover
            out["wave_entropy_breakdown"] = {
                "error": f"{type(e).__name__}: {e}"
            }
    # the chip-side pipeline number: dense-transfer encode core + decode
    # core, back to back
    tot = out["encode_core_dense_s"] + out["decode_core_s"]
    out["device_pipeline_gbps"] = round(2 * out["bytes"] / tot / 1e9, 3)
    return out


def _cache_dir():
    # keyed by the host's CPU flags: this VM migrates between machines, and
    # a shared persistent cache can serve AOT executables built for another
    # machine type (XLA:CPU loader SIGSEGV); see tests/conftest.py
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")][0]
    except Exception:
        flags = "unknown"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.expanduser(f"~/.cache/sperr_tpu/jax_{tag}")


def _tpu_reachable(timeout_s: float) -> bool:
    """Probe device backend init in a subprocess with a hard timeout.

    On this environment the TPU is reached through a tunnel; when the
    tunnel is down, jax.devices() HANGS (observed >8 min) rather than
    raising — an in-process attempt would wedge the whole benchmark.  A
    killable child process is the only safe probe."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except Exception:
        return False


def main():
    _silence_stderr()
    cache = _cache_dir()
    os.makedirs(cache, exist_ok=True)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass

    cfg = os.environ.get("BENCH_CONFIG", "")
    if "--config" in sys.argv:
        cfg = sys.argv[sys.argv.index("--config") + 1]
    if cfg:
        vol, source = load_config(cfg)
        metric_name = f"{cfg} {'x'.join(map(str, vol.shape[::-1]))}"
    else:
        n = int(os.environ.get("BENCH_N", "512"))
        vol = make_volume(n)
        source = "synthetic smooth field"
        metric_name = f"{n}^3"
    nbytes = vol.nbytes

    _progress(f"host engine: start ({metric_name})")
    enc_s, dec_s, stream_len, err = run_host(vol)
    _progress("host engine: done")
    host = {
        "encode_gbps": round(nbytes / enc_s / 1e9, 4),
        "decode_gbps": round(nbytes / dec_s / 1e9, 4),
        "total_gbps": round(2 * nbytes / (enc_s + dec_s) / 1e9, 4),
        "max_err": err,
        "host_cores": os.cpu_count(),
    }
    if os.environ.get("BENCH_HOST_SCALING", "1") != "0":
        # chunk-parallel scaling evidence for the 1-core box: per-chunk
        # balance, pool overhead, GIL release (the properties multi-core
        # parse scaling follows from; see runtime/host_scaling.py)
        try:
            from sperr_tpu.runtime.host_scaling import parse_scaling_evidence

            _progress("host parse-scaling evidence")
            host["parse_scaling"] = parse_scaling_evidence(
                n=256, chunks=4, tol=TOL
            )
        except Exception as e:  # pragma: no cover
            host["parse_scaling"] = {"error": f"{type(e).__name__}: {e}"}

    want_e2e = os.environ.get("BENCH_TPU", "1") != "0"
    want_stages = os.environ.get("BENCH_DEVICE_STAGES", "1") != "0"
    _progress("probing device backend reachability")
    tpu_up = (want_e2e or want_stages) and _tpu_reachable(
        float(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", "180"))
    )
    _progress(f"device backend reachable: {tpu_up}")
    down = {
        "error": "device backend unreachable (init probe timed out)",
        # Chip numbers measured EARLIER in round 5 on the attached v5e
        # (runtime/device_bench.py harness, fori-loop synchronized),
        # recorded here ONLY because the tunnel was down during this
        # run — they are prior measurements, not this run's:
        "prior_round5_device_measurements": {
            "wave_entropy_256_smooth": {
                "wave_total_s": 0.13423, "entropy_stage_s": 0.11347,
                "wave_encode_gbps": 0.50, "fits": True,
                "note": "final round-5 code (2026-08-21 ~02:00)",
            },
            "container_decode_8x256": {
                "parse_s": 0.49716, "decode_core_s": 0.04898,
                "decode_total_gbps": 0.983,
                "hybrid_control_parse_s": 0.2095,
                "note": "hybrid device half measured pre-scan-fix "
                "(0.447 s); the shipped scan form was not re-measured "
                "before the tunnel died",
            },
            "pipeline_stages_256": {
                "dwt3d_s": 0.0029, "idwt3d_s": 0.00232,
                "quantize_s": 0.00068, "encode_core_dense_s": 0.00636,
                "decode_core_s": 0.00309,
            },
            "regimes_pre_retune": {
                "dense_2bpp_256_s": 1.959, "noisy_256_s": 1.135,
                "wave_2d_1024_per_field_ms": 274.3,
                "note": "measured before the round-5 tier retune and the "
                "2D prefix-pack port landed",
            },
        },
    }

    # Device STAGES run before the e2e tunnel path: they are the headline
    # source, and on a slow tunnel day the e2e path alone can eat the whole
    # wall budget (round 5: a 25-min run died with zero output this way).
    stages = {}
    if want_stages and not tpu_up:
        stages = down
    if tpu_up and want_stages:
        _progress("device stages: start")
        try:
            stages = run_device_stages()
        except Exception as e:  # pragma: no cover
            stages = {"error": f"{type(e).__name__}: {e}"}
        _progress("device stages: done")
        try:  # partial dump: survives a later kill / tunnel death
            with open("/tmp/sperr_bench_detail_partial.json", "w") as f:
                json.dump(
                    {"host_native": host, "tpu_device_stages": stages}, f,
                    indent=1,
                )
        except Exception:
            pass

    tpu = {}
    if want_e2e and not tpu_up:
        tpu = down
    if tpu_up and want_e2e and _remaining() <= 120:
        tpu = {"skipped": "bench deadline passed (slow tunnel)"}
        _progress("e2e tunnel path SKIPPED (deadline)")
    elif tpu_up and want_e2e:
        _progress("e2e tunnel path: start")
        try:
            tn = int(os.environ.get("BENCH_TPU_N", "256"))
            tvol = (
                vol[:tn, :tn, :tn]
                if tn <= min(vol.shape)
                else make_volume(tn)
            )
            entropy = os.environ.get("BENCH_TPU_ENTROPY", "wave")
            # the e2e number measures the tunnel, not the chip: never let
            # it run unbounded (watchdog covers a mid-transfer tunnel death
            # AND a merely-slow tunnel day)
            with _watchdog(int(os.environ.get("BENCH_E2E_TIMEOUT", "600"))):
                te, td, tl, terr, wchunks = run_tpu(
                    np.ascontiguousarray(tvol), entropy=entropy
                )
            tb = tvol.nbytes
            tpu = {
                "n": tn,
                "entropy": entropy,
                "wave_chunks_on_device": wchunks,
                "encode_gbps": round(tb / te / 1e9, 4),
                "decode_gbps": round(tb / td / 1e9, 4),
                "max_err": terr,
                "note": "end-to-end through the device tunnel (2-8 MB/s): "
                "wall-clock here measures the tunnel, not the chip — see "
                "tpu_device_stages for the on-device numbers",
            }
        except Exception as e:  # pragma: no cover
            tpu = {"error": f"{type(e).__name__}: {e}"}
        _progress("e2e tunnel path: done")

    # Headline: the device-resident number at production chunk dims when
    # the chip was measured (stage-timed, tunnel excluded — the chip's
    # encode+decode rate for one 256^3 chunk, entropy stage included);
    # host engine otherwise.  BENCH_HEADLINE=host forces the old headline.
    total_gbps = host["total_gbps"]
    metric = f"{metric_name} f32 PWE({TOL}) encode+decode throughput"
    headline_source = "host_native_cpu_engine (end-to-end)"
    dev_num = None
    if isinstance(stages, dict) and "error" not in stages:
        # prefer the flagship 512^3 (8-chunk) measurement; both halves
        # must cover the SAME chunks x dims or the throughput formula is
        # meaningless (ADVICE r3)
        cd = stages.get("container_decode") or {}
        w = stages.get("wave_entropy_512") or {}
        vol_desc = None
        if (
            "wave_total_s" in w
            and "decode_total_s" in cd
            and int(w.get("n", -1)) == int(cd.get("n", -2))
            and int(w.get("batch", -1)) == int(cd.get("chunks", -2))
            and w.get("fits", False)
        ):
            nb = float(w["n"]) ** 3 * 4 * int(w["batch"])
            dev_num = round(
                2 * nb / (w["wave_total_s"] + cd["decode_total_s"]) / 1e9, 4
            )
            side = round((int(w["batch"]) ** (1 / 3)) * w["n"])
            vol_desc = f"{side}^3 ({w['batch']} x {w['n']}^3 chunks)"
        else:
            w = stages.get("wave_entropy_256") or {}
            dec_key = (
                "decode_total_s" if "decode_total_s" in stages
                else "decode_core_s"
            )
            if "wave_total_s" in w and dec_key in stages and int(
                w.get("n", -1)
            ) == int(stages.get("n", -2)):
                nb = float(w["n"]) ** 3 * 4
                dev_num = round(
                    2 * nb / (w["wave_total_s"] + stages[dec_key]) / 1e9, 4
                )
                vol_desc = f"{w['n']}^3 chunk"
        if dev_num is not None:
            stages["device_wave_pipeline_gbps"] = dev_num
    if dev_num is not None and os.environ.get("BENCH_HEADLINE", "device") == "device":
        total_gbps = dev_num
        # name what was measured, in the metric string itself (ADVICE r3)
        metric = (
            f"{vol_desc} device encode + full container decode, "
            f"stage-timed, PWE({TOL})"
        )
        headline_source = (
            "tpu_device: encode = full device SPECK wave pipeline (on-chip, "
            "scan over chunks); decode = host control parse (wall, 1 core) "
            "+ device refinement distribution + invquant + IDWT (on-chip) "
            "— every stream byte consumed"
        )

    baseline = 0.04  # GB/s, reference single-core 512^3 encode (BASELINE.md)
    detail = {
        "headline_source": headline_source,
        "input": source,
        "host_native": host,
        "tpu_path": tpu,
        "tpu_device_stages": stages,
        "compressed_bytes": stream_len,
        "bpp": round(stream_len * 8 / vol.size, 3),
        # host f32 fast mode margin-certifies for f64 decoders
        # (tol - eta detection, per-chunk f64 escalation); the
        # device driver dual-certifies for both the f64 decoders
        # and its own f32 device decoder (parallel/batched.py).
        "pwe_bound": "certified (f64 decoders; device driver "
        "also certifies its f32 decoder)",
    }
    headline = {
        "metric": metric,
        "value": total_gbps,
        "unit": "GB/s/chip",
        "vs_baseline": round(total_gbps / baseline, 2),
        "headline_source": headline_source,
        "detail_file": "/tmp/sperr_bench_detail.json",
    }
    # Full detail goes to a sidecar file AND an early stdout line; the FINAL
    # stdout line is the compact headline only.  The driver keeps a ~2000
    # char tail of stdout: rounds 1-3 all lost the headline (log noise, then
    # sheer line length), so the last line must stay well under that.
    try:
        with open("/tmp/sperr_bench_detail.json", "w") as f:
            json.dump(detail, f, indent=1)
    except Exception:
        pass
    sys.stdout.write("DETAIL " + json.dumps(detail) + "\n")
    sys.stdout.flush()
    sys.stdout.write("\n" + json.dumps(headline) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
